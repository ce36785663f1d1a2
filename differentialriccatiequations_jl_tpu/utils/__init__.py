from .callbacks import Observer, notify
from . import timers

__all__ = ["Observer", "notify", "timers"]
