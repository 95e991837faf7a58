#!/usr/bin/env bash
# Stop backend + frontend started by start_servers.sh.
set -euo pipefail
cd "$(dirname "$0")"
exec python3 scripts/serve.py stop "$@"
