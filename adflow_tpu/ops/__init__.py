"""TPU kernel ops (Pallas): the hand-tiled perf path for the hot loops."""
