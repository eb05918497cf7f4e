"""Trajectory evaluation: ATE (Horn/Umeyama alignment), RPE, KITTI metrics,
and per-benchmark harnesses."""
