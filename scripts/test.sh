#!/bin/bash
# Run the test suite on CPU, isolated from the axon TPU plugin.
#
# The axon sitecustomize on the default PYTHONPATH registers a TPU session in
# EVERY python process; concurrent sessions wedge the single-chip tunnel and
# slow CPU-only work. Tests always run on a virtual 8-device CPU mesh
# (tests/conftest.py), so strip the plugin entirely.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH="$PWD" JAX_PLATFORMS=cpu exec python -m pytest tests/ "$@"
