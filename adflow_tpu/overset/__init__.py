from adflow_tpu.overset.assembly import (  # noqa: F401
    OversetGroup, OversetTable, apply_overset, build_overset)
