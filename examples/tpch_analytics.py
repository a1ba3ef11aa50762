"""Run the TPC-H-style suite against a scale-factor directory.

Usage: python examples/tpch_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eel_spark.queries import QUERIES
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("tpch-example")

for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume"]:
    print(f"\n=== {name} ===")
    QUERIES[name](spark, sf_dir).show(5, truncate=False)
