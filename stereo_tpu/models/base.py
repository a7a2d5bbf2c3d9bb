"""Common model interface."""

from __future__ import annotations

from typing import Callable

from ..config import StereoConfig
from ..pipeline.pipeline import StereoResult


class StereoModel:
    """A named, configured disparity estimator.

    ``build()`` returns a jitted ``(left, right) -> StereoResult``; models
    are pure functions of their config (no trained weights in classical
    stereo — the "parameters" are penalties and windows).
    """

    name: str = "base"

    def __init__(self, cfg: StereoConfig):
        self.cfg = cfg

    def build(self) -> Callable:
        raise NotImplementedError

    def describe(self) -> dict:
        return {
            "model": self.name,
            "cost_fn": self.cfg.cost_fn,
            "D": self.cfg.num_disparities,
            "paths": self.cfg.num_paths,
        }
