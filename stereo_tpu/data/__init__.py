from .synthetic import StereoPair, kitti_like_pair, make_pair

__all__ = ["StereoPair", "make_pair", "kitti_like_pair"]
