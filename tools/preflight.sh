#!/usr/bin/env bash
# Pre-driver certification: everything the graft driver will do, locally.
# Usage: bash tools/preflight.sh   (~30 min at 153 queries / 212 tests)
set -e
cd "$(dirname "$0")/.."
echo "=== 1/4 oracle sweep (sf0.01, all queries vs DuckDB) ==="
python tools/check_oracles.py 2>/dev/null | tail -3
echo "=== 2/4 test suite ==="
python -m pytest tests/ -x -q 2>&1 | tail -1
echo "=== 3/4 entry() smoke (driver-style) ==="
python -c "
import ray; ray.init(address='local', num_cpus=8, include_dashboard=False, log_to_driver=False)
import __ray_entry__ as E
print('entry rows:', E.entry().count(), '| queries:', len(E.queries()), '| oracles:', len(E.oracle_sql()))" 2>/dev/null
echo "=== 4/4 bench smoke (sf0.001, one JSON line) ==="
GRAFT_SF_DIR=/root/testdata/sf0.001 RAY_GRAFT_CPUS=8 python bench.py 2>/dev/null
echo "=== preflight complete ==="
