#!/usr/bin/env bash
# Installs composer-tpu into a fresh virtualenv (the TPU-native equivalent of
# the reference's conda install script, reference scripts/install_composer.sh).
#
#   bash scripts/install_composer.sh [envdir]        # CPU-only JAX
#   COMPOSER_TPU=1 bash scripts/install_composer.sh  # with jax[tpu]
#
# After install: `source <envdir>/bin/activate && composer --help`.

set -euo pipefail

fail() { echo "error: $*" >&2; exit 1; }

ENVDIR="${1:-.venv}"
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

command -v python3 >/dev/null || fail "python3 not found"
python3 - <<'PY' || fail "python >= 3.10 required"
import sys; sys.exit(0 if sys.version_info >= (3, 10) else 1)
PY

if [[ ! -d "$ENVDIR" ]]; then
    echo "- creating virtualenv at $ENVDIR"
    python3 -m venv "$ENVDIR"
fi
# shellcheck disable=SC1091
source "$ENVDIR/bin/activate"

echo "- installing composer-tpu (editable) + dependencies"
pip install --upgrade pip >/dev/null
if [[ "${COMPOSER_TPU:-0}" == "1" ]]; then
    pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
    pip install jax
fi
pip install --editable "$REPO"

if command -v g++ >/dev/null; then
    echo "- prebuilding the native codec (optional; auto-builds on first use)"
    python -c "import composer_tpu.native.loader" || \
        echo "  (native build failed; the pure-Python paths remain fully functional)"
else
    echo "- g++ not found; skipping the native codec (pure-Python paths used)"
fi

echo "- smoke check"
composer --help >/dev/null || fail "console script did not install"

cat <<DONE

==============================
composer-tpu installed.

Activate with:   source $ENVDIR/bin/activate
Then run:        composer --help
==============================
DONE
