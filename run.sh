#!/bin/sh
# Build the native helpers, run a simulation, open the viewer — the
# one-command flow the reference's run.sh provides (make; ./simulation.out;
# python GUI/main.py), without its hardcoded absolute paths. Output lands in
# ./data relative to the caller's directory.
set -e
REPO_DIR=$(CDPATH= cd -- "$(dirname -- "$0")" && pwd)
make -C "$REPO_DIR/fluid_simulation_tpu/native" -s \
    || echo "native build unavailable; using NumPy fallbacks"
PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}" \
    python -m fluid_simulation_tpu.cli run --dump-dir data "$@"
PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}" \
    python -m fluid_simulation_tpu.cli view --data-dir data
