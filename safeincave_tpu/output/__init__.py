from .xdmf import SaveFields
from .screen import ScreenPrinter

__all__ = ["SaveFields", "ScreenPrinter"]
