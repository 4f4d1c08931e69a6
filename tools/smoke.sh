#!/bin/sh
# Pre-commit smoke gate (r5 post-mortem: an un-smoked final commit broke
# every kNN path). Run this before ANY commit that touches a kernel or
# operator — ~60 s total:
#   1. kernel property tests (pin the NumPy kernel contracts, incl. the
#      end-to-end Arrow canary test_sq8_arrow_path_end_to_end_tiny)
#   2. one registry smoke: __spark_entry__.entry() runs and counts
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_kernel_properties.py -q
python - <<'EOF'
from sigmod_2024_contest_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("smoke", cpus=8)
n = e.entry(spark).count()
print(f"entry() rows: {n}")
assert n >= 0
spark.stop()
EOF
echo "SMOKE OK"
