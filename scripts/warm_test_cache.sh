#!/bin/bash
# Warm the TEST compile cache (/tmp/jax_compile_cache) by running each
# test file in its OWN process with cache writes enabled.  Rationale:
# jaxlib's executable (de)serialization segfaults in long one-process
# runs (utils/jaxcfg.py note); isolated per-file processes write safely,
# and the full one-process gate (`pytest tests/`) then runs read-only on
# a clean, complete cache.
set -u
cd "$(dirname "$0")/.."
fails=0
for f in tests/test_*.py; do
    echo "== $f"
    BT2TPU_CACHE_READONLY=0 timeout 2400 python -m pytest "$f" -q \
        2>&1 | tail -2
    rc=$?
    [ $rc -ne 0 ] && { echo "   FAIL rc=$rc"; fails=$((fails+1)); }
done
echo "warm done, $fails failing files"
exit $fails
