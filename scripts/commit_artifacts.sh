#!/bin/sh
# Mechanical round-artifact commit (r18 verdict task 2: BENCHLOG.txt /
# LEAKCHECK.json / BENCH_r*.json / CORRECTNESS_r*.json sat dirty at
# judging time three rounds running). graft.Bench invokes this at the
# end of every FULL run (SPARK_GRAFT_ONLY subset runs skip it, and
# SPARK_GRAFT_NO_COMMIT=1 disables it); it is also safe to run by hand
# at any time. It never touches source files: the commit is restricted
# to the artifact pathspecs below.
set -u
cd "$(dirname "$0")/.." || exit 0
[ -e .git ] || exit 0
# stage (covers brand-new BENCH_rN/CORRECTNESS_rN files), then commit
# ONLY the artifact paths; both steps tolerate "nothing to do"
git add -- BENCHLOG.txt LEAKCHECK.json 2>/dev/null
for f in BENCH_r*.json CORRECTNESS_r*.json PERF_r*.json VERIFY_r*.json; do
  [ -e "$f" ] && git add -- "$f" 2>/dev/null
done
if git status --porcelain -- BENCHLOG.txt LEAKCHECK.json \
    BENCH_r*.json CORRECTNESS_r*.json PERF_r*.json VERIFY_r*.json \
    2>/dev/null | grep -q .; then
  git commit -m "Record bench and correctness round artifacts" \
    -- BENCHLOG.txt LEAKCHECK.json BENCH_r*.json CORRECTNESS_r*.json \
    PERF_r*.json VERIFY_r*.json \
    >/dev/null 2>&1 && echo "[commit_artifacts] committed" \
    || echo "[commit_artifacts] nothing committed"
else
  echo "[commit_artifacts] artifacts already clean"
fi
