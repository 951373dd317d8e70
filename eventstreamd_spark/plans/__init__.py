from eventstreamd_spark.plans.audit import audit_plan, explain_string

__all__ = ["audit_plan", "explain_string"]
