#!/bin/bash
# Drop-in location parity: the reference documents
# `bash evaluation_metrics/eval_all.sh` (readme.md:142); the maintained
# script lives at the repo root. Forwards all arguments/environment.
exec bash "$(dirname "$0")/../eval_all.sh" "$@"
