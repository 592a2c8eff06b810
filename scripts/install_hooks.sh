#!/bin/sh
# Install the pre-commit gate (scripts/precommit_gate.py) into .git/hooks.
set -e
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'HOOK'
#!/bin/sh
exec python scripts/precommit_gate.py
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit gate installed (bypass: SPARK_GRAFT_SKIP_GATE=1)"
