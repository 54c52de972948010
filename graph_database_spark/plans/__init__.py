from .sql_runner import run_sql, run_sql_script

__all__ = ["run_sql", "run_sql_script"]
