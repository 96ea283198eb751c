from icl_tpu.models.registry import net_factory

__all__ = ["net_factory"]
