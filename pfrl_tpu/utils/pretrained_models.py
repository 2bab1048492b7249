"""Pretrained model zoo access (reference parity: pfrl/utils/pretrained_models.py).

The reference downloads published checkpoints from a public bucket
(:160, download_model). This build targets zero-egress containers, so the
zoo resolves models from a local directory tree (``PFRL_TPU_MODEL_ZOO`` env
var or ``~/.pfrl_tpu/models``) with the same layout:
``<zoo>/<algo>/<env>/{best,final}/...``. ``download_model`` keeps the
reference's signature and falls back to urllib when egress exists.
"""

import os
from typing import List, Tuple

MODEL_ZOO_URL_ROOT = "https://chainer-assets.preferred.jp/pfrl"


def get_model_zoo_root() -> str:
    return os.environ.get(
        "PFRL_TPU_MODEL_ZOO", os.path.expanduser("~/.pfrl_tpu/models")
    )


def download_model(
    alg: str, env: str, model_type: str = "best"
) -> Tuple[str, bool]:
    """Resolve (and if possible fetch) a pretrained model directory.

    Returns (path, exists). Mirrors pfrl/utils/pretrained_models.py:160's
    contract of returning a directory to pass to ``agent.load``.
    """
    local = os.path.join(get_model_zoo_root(), alg, env, model_type)
    if os.path.isdir(local):
        return local, True
    url = f"{MODEL_ZOO_URL_ROOT}/{alg}/{env}/{model_type}.zip"
    try:
        import io
        import urllib.request
        import zipfile

        with urllib.request.urlopen(url, timeout=30) as resp:
            data = resp.read()
        os.makedirs(local, exist_ok=True)
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            zf.extractall(local)
        return local, True
    except Exception:
        return local, False


def list_local_models() -> List[str]:
    root = get_model_zoo_root()
    found = []
    if not os.path.isdir(root):
        return found
    for alg in sorted(os.listdir(root)):
        for env in sorted(os.listdir(os.path.join(root, alg))):
            found.append(f"{alg}/{env}")
    return found
