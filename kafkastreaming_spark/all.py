"""Import every operator module so their @query decorators register.

``__spark_entry__.py``, tests, the verifier, and bench.py all import this
module and then read ``registry.QUERIES`` / ``registry.ORACLES``.
"""

from __future__ import annotations

from kafkastreaming_spark.operators import (  # noqa: F401
    aggregations,
    joins,
    projections,
    scans,
    setops,
    sorts,
)
from kafkastreaming_spark.registry import ORACLES, QUERIES  # noqa: F401
