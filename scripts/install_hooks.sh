#!/bin/sh
# Install the pre-commit gate (scripts/precommit_gate.py) into .git/hooks.
set -e
cd "$(dirname "$0")/.."
# Resolve an interpreter at INSTALL time: many distros ship only
# python3 — a hook hard-coding bare `python` would fail every commit.
PY="$(command -v python3 || command -v python)"
cat > .git/hooks/pre-commit <<HOOK
#!/bin/sh
exec "$PY" scripts/precommit_gate.py
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit gate installed using $PY (bypass: SPARK_GRAFT_SKIP_GATE=1)"
