from eventstreamd_spark.plans.audit import (
    audit_plan,
    explain_string,
    global_window_nodes,
)

__all__ = ["audit_plan", "explain_string", "global_window_nodes"]
