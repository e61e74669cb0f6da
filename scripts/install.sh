#!/usr/bin/env bash
# Install tstar-tpu (reference install.sh equivalent — no external clones or
# checkpoint downloads required; models load from local HF checkpoint dirs).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== building native video decoder =="
make -C native

echo "== installing python package =="
pip install -e .

echo "== smoke check =="
python -c "import tstar_tpu; print('tstar-tpu', tstar_tpu.__version__)"
echo "Done. Detector/VLM weights: point --checkpoint_dir / model_path at local"
echo "HF checkpoint directories (e.g. google/owlvit-base-patch32 contents)."
