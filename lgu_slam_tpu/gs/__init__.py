"""3-D Gaussian Splatting stage (reference: to3DGS/ — SplaTAM-style
mapping over the SLAM reconstruction + TSDF meshing)."""
