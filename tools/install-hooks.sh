#!/usr/bin/env bash
# Install the repo's git hooks (run once per clone). See tools/pre-commit.sh.
set -eu
cd "$(git rev-parse --show-toplevel)"
cp tools/pre-commit.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (Test/compile guard)"
