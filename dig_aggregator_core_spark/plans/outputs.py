"""The Outputs ADT (reference Outputs.scala:12-25): what a rule routes an
input to — one or more named outputs, every output, or deliberately none."""

from __future__ import annotations


class _All:
    """Input contributes to every named output."""

    def __repr__(self) -> str:
        return "Outputs.ALL"


class _Null:
    """Input is intentionally ignored."""

    def __repr__(self) -> str:
        return "Outputs.NULL"


ALL = _All()
NULL = _Null()


class Named:
    """Input contributes to these named outputs."""

    __slots__ = ("names",)

    def __init__(self, *names: str) -> None:
        self.names = tuple(names)

    def __repr__(self) -> str:
        return f"Outputs.Named{self.names!r}"

    def __eq__(self, other) -> bool:
        return isinstance(other, Named) and other.names == self.names

    def __hash__(self) -> int:
        return hash(self.names)
