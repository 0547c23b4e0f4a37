#!/bin/bash
# Seal round evidence: stage and commit every driver-written artifact
# (bench, correctness, leak/copy checks, judge output) so the verdict
# chain's citations are always in-repo. Idempotent: commits only when
# something actually changed. Called at the end of tools/run_verify.sh
# and safe to run standalone at any time.
cd /root/repo
git add -A -- BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL.json \
  LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md PROGRESS.jsonl \
  2>/dev/null || true
if ! git diff --cached --quiet 2>/dev/null; then
  git commit -q -m "Seal round evidence artifacts"
  echo "[seal] committed round evidence"
else
  echo "[seal] evidence already tracked, nothing to commit"
fi
