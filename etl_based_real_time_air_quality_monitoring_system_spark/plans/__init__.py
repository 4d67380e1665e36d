from .flagship import flagship_pipeline

__all__ = ["flagship_pipeline"]
