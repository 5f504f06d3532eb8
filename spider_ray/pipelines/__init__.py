"""Pipeline wiring: the flagship crawl (driver ``entry()``) and the
queries()/oracle_sql() registry (driver correctness gate)."""
