from .util import Adapter, AdapterManager

__all__ = ["Adapter", "AdapterManager"]
