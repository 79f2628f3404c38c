#!/bin/sh
# Final-round snapshot commit: stages EVERYTHING the judge reads — source,
# docs, AND the driver/leak/bench artifacts whose round bumps have been
# left uncommitted three rounds running (VERDICT r7–r9 "What's wrong").
# Usage: tools/snapshot_commit.sh "<commit message>"
set -e
cd "$(dirname "$0")/.."
git add -A src tools SCALE.md README.md SURVEY.md FIXTURES.md build.sbt
# driver-written artifacts: LEAKCHECK's round bump, the per-round bench +
# correctness records, the scale gate, and the clean bench snapshot.
# (COPYCHECK.json and PROGRESS.jsonl are .gitignore'd by design — the
# driver owns them — so they are deliberately NOT in this list.)
for f in LEAKCHECK.json BENCH_SCALE.json bench_out.json \
    BENCH_r*.json CORRECTNESS_r*.json; do
  # guard anyway: `git add` on an ignored path exits 1 under set -e
  if [ -e "$f" ] && ! git check-ignore -q "$f"; then git add "$f"; fi
done
git commit -m "${1:-Final round snapshot}"
git status --short
