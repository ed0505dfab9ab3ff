"""URL model: path decomposition, format/compression inference from the
extension, query-string overrides (`file.fastq?format=bam&compression=gz`),
standard-stream aliases and base-directory relocation.

Semantics follow the reference URL class (reference url.h:45-271,
url.cpp:262-700): the encoded form is rebuilt deterministically from the
parsed state, with the effective format always materialized into the query
(this is why compiled instructions show `file.fastq?format=fastq`).
"""

from __future__ import annotations

import os

from ..errors import ConfigurationError

CANONICAL_STDIN = "/dev/stdin"
CANONICAL_STDOUT = "/dev/stdout"
CANONICAL_STDERR = "/dev/stderr"
CANONICAL_NULL = "/dev/null"

FORMAT_TYPES = (
    "none",
    "fastq",
    "sam",
    "bam",
    "bai",
    "cram",
    "crai",
    "vcf",
    "bcf",
    "csi",
    "gzi",
    "tbi",
    "bed",
    "json",
)
_FORMAT_ALIASES = {"fq": "fastq"}
COMPRESSIONS = ("none", "gz", "bgzf", "bz2", "xz")
_COMPRESSION_EXTENSIONS = {"gz": "gz", "bz2": "bz2", "xz": "xz"}


def parse_format_type(value: str | None) -> str | None:
    if value is None:
        return None
    value = _FORMAT_ALIASES.get(value, value)
    return value if value in FORMAT_TYPES else None


def parse_compression(value: str | None) -> str | None:
    return value if value in COMPRESSIONS else None


def parse_compression_level(value: str | None) -> str | None:
    return value if value in tuple("0123456789") else None


def expand_shell(expression: str) -> str:
    """~ and ${VAR} expansion (reference url.cpp expand_shell)."""
    if not expression:
        return expression
    resolved = []
    variable = ""
    position = 0
    while position < len(expression):
        c = expression[position]
        if c == "~":
            if not resolved and not variable:
                resolved.append(os.environ.get("HOME", "~"))
            else:
                resolved.append(c)
        elif c == "$" and not variable:
            variable = "$"
        elif c == "{" and variable == "$":
            variable = "${"
        elif c == "}" and variable.startswith("${"):
            name = variable[2:]
            value = os.environ.get(name)
            if value is not None:
                resolved.append(value)
            variable = ""
        elif variable.startswith("${"):
            variable += c
        elif variable == "$":
            # `$` not followed by `{` - emit literally
            resolved.append("$")
            resolved.append(c)
            variable = ""
        else:
            resolved.append(c)
        position += 1
    if variable:
        resolved.append(variable)
    return "".join(resolved)


def normalize_standard_stream(path: str, direction: str) -> str:
    """Map `-` and stream aliases to canonical device paths."""
    if path == "-":
        return CANONICAL_STDIN if direction == "in" else CANONICAL_STDOUT
    aliases = {
        "stdin": CANONICAL_STDIN,
        "stdout": CANONICAL_STDOUT,
        "stderr": CANONICAL_STDERR,
        "null": CANONICAL_NULL,
        "/dev/fd/0": CANONICAL_STDIN,
        "/dev/fd/1": CANONICAL_STDOUT,
        "/dev/fd/2": CANONICAL_STDERR,
    }
    return aliases.get(path, path)


class URL:
    __slots__ = (
        "_encoded",
        "_path",
        "_basename",
        "_dirname",
        "_query",
        "format_type",
        "implicit_compression",
        "explicit_compression",
        "compression_level",
    )

    def __init__(self, encoded: str = ""):
        self.clear()
        if encoded:
            self.parse(encoded)

    def clear(self):
        self._encoded = ""
        self._path = ""
        self._basename = ""
        self._dirname = ""
        self._query = ""
        self.format_type = None
        self.implicit_compression = None
        self.explicit_compression = None
        self.compression_level = None

    def copy(self) -> "URL":
        other = URL()
        other._encoded = self._encoded
        other._path = self._path
        other._basename = self._basename
        other._dirname = self._dirname
        other._query = self._query
        other.format_type = self.format_type
        other.implicit_compression = self.implicit_compression
        other.explicit_compression = self.explicit_compression
        other.compression_level = self.compression_level
        return other

    # --- parsing ----------------------------------------------------------
    def parse(self, encoded: str):
        self.clear()
        if not encoded:
            return
        self._encoded = encoded
        position = encoded.rfind("/")
        if position >= 0:
            if position + 1 < len(encoded):
                self._basename = encoded[position + 1 :]
            self._dirname = encoded[:position] if position > 0 else "/"
        else:
            self._basename = encoded

        position = self._basename.find("?")
        if position >= 0:
            if position + 1 < len(self._basename):
                self._query = self._basename[position + 1 :]
            self._basename = self._basename[:position]

        if self._basename in (".", ".."):
            if self._dirname:
                self._dirname += "/"
            self._dirname += self._basename
            self._basename = ""
        else:
            # implicit compression/type from trailing extensions
            buffer = self._basename
            position = buffer.rfind(".")
            if position > 0 and position + 2 < len(buffer):
                extension = buffer[position + 1 :]
                buffer = buffer[:position]
                if extension in _COMPRESSION_EXTENSIONS:
                    self.implicit_compression = _COMPRESSION_EXTENSIONS[extension]
                    position = buffer.rfind(".")
                    extension = ""
                    if position >= 0 and position + 2 < len(buffer):
                        extension = buffer[position + 1 :]
                if extension:
                    self.format_type = parse_format_type(extension)
        self._parse_query()
        self.refresh()

    def _parse_query(self):
        if not self._query:
            return
        for piece in self._query.split("&"):
            if "=" in piece:
                key, _, value = piece.partition("=")
            else:
                key, value = piece, ""
            if not key or not value:
                continue
            if key == "format":
                parsed = parse_format_type(value)
                self.format_type = parsed
            elif key == "compression":
                self.explicit_compression = parse_compression(value)
            elif key == "level":
                self.compression_level = parse_compression_level(value)

    # --- canonical form ----------------------------------------------------
    def refresh(self):
        self._path = ""
        if self._dirname:
            self._path += self._dirname
        if self._basename:
            if self._path and not self._path.endswith("/"):
                self._path += "/"
            self._path += self._basename

        query = []
        if self.format_type is not None:
            query.append(("format", self.format_type))
            if self.format_type == "sam":
                compression = self.compression
                if compression in ("gz", "bgzf"):
                    # x.sam.gz writes gzip-compressed SAM, as the
                    # reference does through htslib's 'z' mode
                    # (reference url.cpp extension inference + hts.cpp)
                    query.append(("compression", compression))
                    if self.compression_level is not None:
                        query.append(("level", self.compression_level))
                else:
                    query.append(("compression", "none"))
            elif self.format_type in ("fastq", "bam"):
                compression = self.compression
                if compression == "none":
                    query.append(("compression", "none"))
                elif compression in ("gz", "bgzf"):
                    query.append(("compression", compression))
                    if self.compression_level is not None:
                        query.append(("level", self.compression_level))
                elif compression is None:
                    if self.format_type == "bam" and self.compression_level is not None:
                        query.append(("level", self.compression_level))
            elif self.format_type == "cram":
                if self.compression_level is not None:
                    query.append(("level", self.compression_level))
        self._query = "&".join(f"{k}={v}" for k, v in query)
        self._encoded = self._path
        if self._query:
            self._encoded += "?" + self._query

    # --- accessors ----------------------------------------------------------
    @property
    def encoded(self) -> str:
        return self._encoded

    @property
    def path(self) -> str:
        return self._path

    @property
    def basename(self) -> str:
        return self._basename

    @property
    def dirname(self) -> str:
        return self._dirname

    @property
    def compression(self) -> str | None:
        return (
            self.explicit_compression
            if self.explicit_compression is not None
            else self.implicit_compression
        )

    def is_stdin(self) -> bool:
        return self._path == CANONICAL_STDIN

    def is_stdout(self) -> bool:
        return self._path == CANONICAL_STDOUT

    def is_stderr(self) -> bool:
        return self._path == CANONICAL_STDERR

    def is_dev_null(self) -> bool:
        return self._path == CANONICAL_NULL

    def is_standard_stream(self) -> bool:
        return self.is_stdin() or self.is_stdout() or self.is_stderr() or self.is_dev_null()

    def is_absolute(self) -> bool:
        return bool(self._dirname) and self._dirname[0] == "/"

    def is_readable(self) -> bool:
        if self.is_stdin():
            return True
        if self.is_stdout() or self.is_stderr() or self.is_dev_null():
            return False
        return os.access(self._path, os.R_OK)

    def is_writable(self) -> bool:
        if self.is_stdin():
            return False
        if self.is_standard_stream():
            return True
        if os.access(self._path, os.F_OK):
            return os.access(self._path, os.W_OK)
        return os.access(self._dirname or ".", os.W_OK)

    # --- mutation -----------------------------------------------------------
    def set_type(self, format_type: str | None):
        self.format_type = format_type
        self.refresh()

    def set_compression(self, compression: str | None):
        self.explicit_compression = compression
        self.refresh()

    def set_compression_level(self, level: str | None):
        self.compression_level = level
        self.refresh()

    def override_query(self, other: "URL"):
        if other.format_type is not None:
            self.format_type = other.format_type
        if other.implicit_compression is not None:
            self.implicit_compression = other.implicit_compression
        if other.explicit_compression is not None:
            self.explicit_compression = other.explicit_compression
        if other.compression_level is not None:
            self.compression_level = other.compression_level
        self.refresh()

    def relocate_child(self, base: "URL"):
        """Place this URL inside the base directory path."""
        if base._path and not self.is_absolute():
            joined = base._path
            if self._dirname:
                if not joined.endswith("/"):
                    joined += "/"
                joined += self._dirname
            self._dirname = joined
            self.refresh()

    def relocate_sibling(self, base: "URL"):
        """Place this URL next to the base URL (same directory)."""
        if not base.is_standard_stream():
            if base._dirname and not self.is_absolute():
                joined = base._dirname
                if self._dirname:
                    if not joined.endswith("/"):
                        joined += "/"
                    joined += self._dirname
                self._dirname = joined
                self.refresh()

    def __eq__(self, other):
        return isinstance(other, URL) and self._encoded == other._encoded

    def __lt__(self, other):
        return self._encoded < other._encoded

    def __hash__(self):
        return hash(self._encoded)

    def __str__(self):
        return self._encoded

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"URL({self._encoded!r})"


def standardize_url(value: str, direction: str) -> URL:
    """expand_shell + standard stream normalization + parse (reference
    url.cpp standardize_url_value)."""
    if isinstance(value, URL):
        value = value.encoded
    buffer = expand_shell(value)
    buffer = normalize_standard_stream(buffer, direction)
    return URL(buffer)


def standardize_url_value_by_key(key: str, container: dict, direction: str):
    if key in container and container[key] is not None:
        value = container[key]
        if not isinstance(value, str):
            raise ConfigurationError(f"{key} element must be a string")
        container[key] = standardize_url(value, direction).encoded


def standardize_url_array_by_key(key: str, container: dict, direction: str):
    if key in container and container[key] is not None:
        value = container[key]
        if isinstance(value, str):
            value = [value]
        if not isinstance(value, list):
            raise ConfigurationError(f"{key} element must be a string array")
        container[key] = [standardize_url(v, direction).encoded for v in value]


def relocate_url_by_key(key: str, container: dict, base: URL):
    if key in container and container[key] is not None:
        url = URL(container[key])
        url.relocate_child(base)
        container[key] = url.encoded


def relocate_url_array_by_key(key: str, container: dict, base: URL):
    if key in container and container[key] is not None:
        urls = []
        for encoded in container[key]:
            url = URL(encoded)
            url.relocate_child(base)
            urls.append(url.encoded)
        container[key] = urls
