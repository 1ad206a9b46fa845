"""Scaling layer: device meshes, batched (DP) registration, spatially-sharded
stencils with ICI halo exchange, and the distributed DCT."""
