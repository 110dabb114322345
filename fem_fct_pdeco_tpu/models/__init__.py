from fem_fct_pdeco_tpu.models.base import ModelBase

__all__ = ["ModelBase"]
