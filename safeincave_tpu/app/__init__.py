"""Application layer: CLI, JSON-case builder/editor, runners (reference L9)."""
from .builder import InputFileBuilder
from .simulator_runner import SimulatorRunner
from .script_runner import run_script

__all__ = ["InputFileBuilder", "SimulatorRunner", "run_script"]
