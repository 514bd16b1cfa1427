"""Host-side runtime: native kernels, structured logging, checkpointing,
profiling hooks."""
