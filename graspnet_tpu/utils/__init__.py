"""Host utilities: logging, profiling."""
