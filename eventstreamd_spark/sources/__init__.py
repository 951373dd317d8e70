"""Custom PySpark DataSource implementations."""
