"""Pure vectorized kernels — no Ray imports here; unit-testable standalone."""
