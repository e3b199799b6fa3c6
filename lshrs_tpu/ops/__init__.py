"""Device compute kernels: bitpack, collision scan, top-k, rerank."""
