"""Typed error taxonomy with process exit codes.

Mirrors the reference error model and exit codes exactly (reference
error.h:31-44: internal 2, configuration 3, out-of-memory 4, command line
5, IO 6, sequence 7, overflow 8, corrupt auxiliary 9, JSON validation 10);
shell pipelines can dispatch on the code, and
errors carry a push-down context stack describing where in the configuration
compilation or IO stack they originated.
"""

from __future__ import annotations


class PheniqsError(Exception):
    """Base error. `code` is the process exit code."""

    code = 1
    name = "Error"

    def __init__(self, message: str = ""):
        super().__init__(message)
        self.message = message
        self.stack: list[str] = []

    def push(self, context: str) -> "PheniqsError":
        """Record the enclosing component, innermost first."""
        self.stack.append(context)
        return self

    def describe(self) -> str:
        where = "".join(f"{frame} :: " for frame in reversed(self.stack))
        return f"{where}{self.name} : {self.message}"

    def __str__(self) -> str:  # pragma: no cover - display only
        return self.describe()


class InternalError(PheniqsError):
    code = 2
    name = "Internal error"


class ConfigurationError(PheniqsError):
    code = 3
    name = "Configuration error"


class OutOfMemoryError(PheniqsError):
    code = 4
    name = "Out of memory error"


class CommandLineError(PheniqsError):
    code = 5
    name = "Command line error"


class IOError_(PheniqsError):
    code = 6
    name = "IO error"


class SequenceError(PheniqsError):
    code = 7
    name = "Sequence error"


class OverflowError_(PheniqsError):
    code = 8
    name = "Overflow error"


class CorruptAuxiliaryError(PheniqsError):
    code = 9
    name = "Corrupt auxiliary error"


class JsonError(PheniqsError):
    code = 10
    name = "JSON error"


class BadConfigurationFileError(ConfigurationError):
    name = "Bad configuration file error"
