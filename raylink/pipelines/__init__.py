from .flagship import flagship, FlagshipResult

__all__ = ["flagship", "FlagshipResult"]
