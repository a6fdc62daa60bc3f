#!/usr/bin/env bash
# Opt-in real-library integration lane (VERDICT r5 task 6).
#
# The build container ships none of seglearn/tsfresh/tsfel/pycatch22, so
# tests/test_integrations_optional.py importorskips (4 skips) in the
# default run. In an environment WITH network, this script provisions a
# scratch venv with the real libraries and runs the same tests against
# them — the wrapper contract (reference
# tests/test_features_integration.py:28-480) then executes real library
# code instead of wrapper-shaped fakes.
set -euo pipefail
cd "$(dirname "$0")/.."

VENV="${INTEGRATION_VENV:-/tmp/tsflex_spark_integration_venv}"
if [ ! -x "$VENV/bin/python" ]; then
    python -m venv --system-site-packages "$VENV"
fi
"$VENV/bin/pip" install --quiet seglearn tsfresh tsfel pycatch22 pillow soundfile
exec "$VENV/bin/python" -m pytest tests/test_integrations_optional.py tests/test_multimodal_optional.py -m real_libs -v "$@"
