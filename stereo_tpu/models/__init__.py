"""Model zoo: named stereo-matching model families.

The reference implements exactly one model — classical block/census SGM
(SURVEY.md §2.1); this package exposes it alongside derived families that
trade quality for speed, all behind one interface:

  * ``ClassicSGM``     — the full reference-parity pipeline (configs 1-5).
  * ``BlockMatching``  — cost + WTA only (config 1 family, no aggregation).
  * ``PyramidSGM``     — coarse-to-fine: half-resolution SGM predicts a
    base disparity, the full-resolution pass only searches a small
    residual window around it (new capability; see pyramid.py).

``get_model(name, **kw)`` builds by name for the CLI/benchmarks.
"""

from .base import StereoModel
from .classic import BlockMatching, ClassicSGM
from .pyramid import PyramidSGM

MODELS = {
    "classic": ClassicSGM,
    "block_matching": BlockMatching,
    "pyramid": PyramidSGM,
}


def get_model(name: str, **kwargs) -> StereoModel:
    if name not in MODELS:
        raise ValueError(f"unknown model {name!r}; valid: {sorted(MODELS)}")
    return MODELS[name](**kwargs)


__all__ = [
    "StereoModel",
    "ClassicSGM",
    "BlockMatching",
    "PyramidSGM",
    "MODELS",
    "get_model",
]
