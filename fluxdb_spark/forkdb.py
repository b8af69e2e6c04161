"""ForkDB — in-memory fork tracking for the speculative overlay.

The reference keeps not-yet-final ("reversible") blocks in an in-memory
ForkDB and recomputes the speculative write-list for the current head fork
after every new block (pipeline.go:330-367, updateSpeculativeWrites
267-279); reads overlay that list on durable rows (read.go:155-169).

The state is tiny (a few hundred blocks near the head — the reference buffers
300, pipeline.go:110), so this is deliberately plain driver-side Python: the
*data* goes through Spark (the overlay becomes a small DataFrame unioned into
read plans); only the fork *bookkeeping* lives here. This matches the
reference's own design, where ForkDB is heap state, not storage.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BlockRef:
    id: str
    num: int


@dataclass
class SpeculativeBlock:
    ref: BlockRef
    parent_id: str
    # change-log rows produced by this block, as plain tuples conforming to
    # SPECULATIVE_SCHEMA minus parent_block_id (added when materialized).
    rows: list[tuple] = field(default_factory=list)


class ForkDB:
    """Tracks reversible blocks by parent linkage (reference ForkDB via
    AddLink, pipeline.go:352; ReversibleSegment walk pipeline.go:303-328)."""

    def __init__(self, lib: BlockRef):
        self.lib = lib  # last irreversible block
        self.blocks: dict[str, SpeculativeBlock] = {}

    def add_block(self, block: SpeculativeBlock) -> None:
        if block.ref.num <= self.lib.num:
            return  # at/below LIB: never reversible
        self.blocks[block.ref.id] = block

    def reversible_segment(self, head_id: str) -> list[SpeculativeBlock]:
        """Chain from LIB (exclusive) to `head_id` (inclusive), oldest first.
        Empty if the head doesn't connect to LIB (unknown fork)."""
        out: list[SpeculativeBlock] = []
        cur = head_id
        while cur != self.lib.id:
            blk = self.blocks.get(cur)
            if blk is None:
                return []
            out.append(blk)
            cur = blk.parent_id
        out.reverse()
        return out

    def advance_lib(self, new_lib: BlockRef, keep_depth: int = 0) -> None:
        """Move the irreversibility horizon up and purge blocks at or below
        it (reference purges ForkDB as LIB advances, pipeline.go:404-405;
        read-only servers keep 200 blocks of slack, pipeline.go:426)."""
        self.lib = new_lib
        floor = new_lib.num - keep_depth
        self.blocks = {
            bid: b for bid, b in self.blocks.items() if b.ref.num > floor
        }

    def block(self, block_id: str) -> SpeculativeBlock | None:
        """S7 — point lookup of one reversible block (pipeline.go:218-226)."""
        return self.blocks.get(block_id)
