"""Runtime utilities: I/O codecs, validation, timers, viz, profiling."""
