"""Re-export of the reference simulator (moved into the package in
round 2 so pipeline queries can dump simulator-produced oracle
parquet; see spider_ray/oracle_sim.py)."""

from spider_ray.oracle_sim import *  # noqa: F401,F403
from spider_ray.oracle_sim import OracleCrawler, OracleResult, _Cand  # noqa: F401
