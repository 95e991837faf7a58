#!/usr/bin/env bash
# Start backend (REST API) + frontend (static UI). Thin wrapper over the
# Python orchestrator; see scripts/serve.py for the full behavior.
set -euo pipefail
cd "$(dirname "$0")"
exec python3 scripts/serve.py start "$@"
