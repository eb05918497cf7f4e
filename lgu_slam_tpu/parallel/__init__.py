"""Device-mesh parallelism: distributed bundle adjustment (keyframe/edge
sharding over ICI) and data-parallel training."""
