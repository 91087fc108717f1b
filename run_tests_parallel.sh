#!/usr/bin/env bash
# Default test lane as two concurrent pytest shards (two JVMs, 8
# Spark threads each — the box has 32 cores; the serial lane leaves
# most of them idle).  Each shard gets its own session warehouse via
# the conftest tmp_path fixture, and the shared read-only inputs
# (/root/testdata) are safe under concurrency.  Alternating split by
# file name spreads the heavy files (bm25_index, mobility_pipeline,
# oracle_parity, concurrency_mixed) roughly evenly.
#
# Usage: ./run_tests_parallel.sh [extra pytest args...]
set -u
cd "$(dirname "$0")"

# measured-heavy files (descending weight) interleave first so both
# shards get an even share of the long poles; the rest alternate
HEAVY=(tests/test_oracle_parity.py tests/test_bm25_index.py
       tests/test_mobility_pipeline.py tests/test_curation_pipeline.py
       tests/test_ivfpq.py tests/test_concurrency_mixed.py
       tests/test_matview.py tests/test_persistent_ivf.py
       tests/test_incremental_dedup.py tests/test_streaming.py
       tests/test_ann.py tests/test_text_properties.py
       tests/test_additive_supersede.py tests/test_sketches.py)
mapfile -t FILES < <(ls tests/test_*.py | sort)
A=() ; B=() ; i=0
for f in "${HEAVY[@]}"; do
  if (( i % 2 == 0 )); then A+=("$f"); else B+=("$f"); fi
  i=$((i + 1))
done
i=0
for f in "${FILES[@]}"; do
  skip=0
  for h in "${HEAVY[@]}"; do [[ "$f" == "$h" ]] && skip=1 && break; done
  (( skip )) && continue
  if (( i % 2 == 0 )); then A+=("$f"); else B+=("$f"); fi
  i=$((i + 1))
done

python -m pytest "${A[@]}" -q "$@" > /tmp/pytest_shard_a.log 2>&1 &
PA=$!
python -m pytest "${B[@]}" -q "$@" > /tmp/pytest_shard_b.log 2>&1 &
PB=$!
wait "$PA"; RA=$?
wait "$PB"; RB=$?
echo "--- shard A (rc=$RA) ---"; tail -2 /tmp/pytest_shard_a.log
echo "--- shard B (rc=$RB) ---"; tail -2 /tmp/pytest_shard_b.log
exit $(( RA || RB ))
