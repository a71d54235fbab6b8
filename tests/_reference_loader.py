"""Import the reference implementation (/root/reference) as a parity oracle.

The reference environment lacks torchvision and skimage; both are only
touched by code paths the parity tests never exercise (``save_interm``
image dumps, ``dilate_mask``), so they are stubbed with empty modules.
tqdm/matplotlib/PIL/torch are present.

Used by tests/test_cross_parity.py and benchmarks/cross_parity_evidence.py
to run the reference's OWN ``MultiScaleGaussianDiffusion`` sampler on CPU
as the ground truth for our sampler (SinDDM/models.py:462-568).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_models():
    """Return the reference ``SinDDM.models`` module (imported once)."""
    try:
        import torchvision  # noqa: F401
    except ImportError:
        utils = _stub(
            "torchvision.utils",
            save_image=lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("torchvision stub: save_image unavailable")
            ),
        )
        tv = _stub("torchvision")
        tv.utils = utils
    try:
        import skimage  # noqa: F401
    except ImportError:
        sk = _stub("skimage")
        sk.morphology = _stub("skimage.morphology")
        sk.filters = _stub("skimage.filters")

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import SinDDM.models as ref_models

    return ref_models
