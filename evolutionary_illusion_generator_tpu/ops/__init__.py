"""Device ops: grids, rendering, optical flow, fitness metrics, kernels."""
