"""HTTP service layer (aiohttp)."""

from .config import APIConfig

__all__ = ["APIConfig"]
