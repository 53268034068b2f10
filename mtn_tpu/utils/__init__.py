from mtn_tpu.utils.logging import CSVLogger, TraceLogger, dump_params_txt
from mtn_tpu.utils.checkpoint import CheckpointManager

__all__ = ["CSVLogger", "TraceLogger", "dump_params_txt",
           "CheckpointManager"]
