from mtn_tpu.decode.beam import BeamDecoder, BeamResult

__all__ = ["BeamDecoder", "BeamResult"]
