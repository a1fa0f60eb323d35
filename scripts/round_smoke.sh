#!/bin/sh
# Hardware smoke of the shipping env-flag matrix (see round_smoke.py).
exec python "$(dirname "$0")/round_smoke.py" "$@"
