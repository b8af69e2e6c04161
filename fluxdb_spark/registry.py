"""Collection registry — the analog of the reference's factory registry.

The reference registers tablet/singlet factories per 2-byte collection id at
init time and panics on duplicates or reserved ids (tablet.go:43-53,
singlet.go:40-50; reserved ids >= 0xFFEF per the check at tablet.go:44-46,
internal index collection 0xFFFF at indexing.go:585-586).

Here a collection is a named logical dataset inside the canonical change-log
relation, optionally carrying a typed *view decoder* — a function that turns
the opaque `value` column into typed columns (the place where Spark's type
system exceeds the reference, which never looks inside values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

# Reference reserves collection ids >= 0xFFEF for library use
# (tablet.go:44-46); 0xFFFF is the internal index collection.
RESERVED_MIN = 0xFFEF
INDEX_COLLECTION_ID = 0xFFFF
INDEX_COLLECTION = "__index__"


class CollectionError(ValueError):
    pass


@dataclass(frozen=True)
class Collection:
    """A registered logical dataset within the change-log."""

    collection_id: int  # uint16 namespace, mirrors the reference
    name: str
    kind: str = "tablet"  # "tablet" | "singlet"
    # Optional decoder: value Column -> typed Column (struct) for typed views.
    decoder: Callable[[Column], Column] | None = None


@dataclass
class CollectionRegistry:
    _by_id: dict[int, Collection] = field(default_factory=dict)
    _by_name: dict[str, Collection] = field(default_factory=dict)

    def register(self, coll: Collection, internal: bool = False) -> Collection:
        if not 0 <= coll.collection_id <= 0xFFFF:
            raise CollectionError(
                f"collection id {coll.collection_id:#x} outside uint16 range"
            )
        if coll.collection_id >= RESERVED_MIN and not internal:
            raise CollectionError(
                f"collection id {coll.collection_id:#x} is in the reserved "
                f"range [{RESERVED_MIN:#x}, 0xFFFF]"
            )
        if coll.collection_id in self._by_id:
            raise CollectionError(
                f"collection id {coll.collection_id:#x} already registered"
            )
        if coll.name in self._by_name:
            raise CollectionError(f"collection name {coll.name!r} already registered")
        if coll.kind not in ("tablet", "singlet"):
            raise CollectionError(f"unknown collection kind {coll.kind!r}")
        self._by_id[coll.collection_id] = coll
        self._by_name[coll.name] = coll
        return coll

    def get(self, name: str) -> Collection:
        return self._by_name[name]

    def get_by_id(self, collection_id: int) -> Collection:
        return self._by_id[collection_id]

    def typed_view(self, df: DataFrame, name: str) -> DataFrame:
        """Project the change-log rows of one collection through its decoder."""
        from pyspark.sql import functions as F

        coll = self.get(name)
        out = df.filter(F.col("collection") == name)
        if coll.decoder is not None:
            out = out.withColumn("decoded", coll.decoder(F.col("value")))
        return out


def default_registry() -> CollectionRegistry:
    reg = CollectionRegistry()
    reg.register(
        Collection(INDEX_COLLECTION_ID, INDEX_COLLECTION, kind="singlet"),
        internal=True,
    )
    return reg
