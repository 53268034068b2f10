from mtn_tpu.models.mtn import MTN, make_model

__all__ = ["MTN", "make_model"]
