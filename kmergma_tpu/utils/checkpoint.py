"""Scan checkpoint/resume.

The reference has no persistence beyond appending hits to a fasta
(SURVEY.md section 5.4).  Because each contig's scan is stateless given
(profile, contig), checkpointing a long multi-contig scan reduces to
recording the last fully-processed record index plus the hits accumulated
so far; resuming replays from the next record.  The checkpoint is a JSON
file updated atomically after each record.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

from .fasta import FastaRecord


@dataclass
class ScanCheckpoint:
    path: str
    genome_id: str  # identity guard (path + profile fingerprint)
    next_record: int = 0
    genome_pos: int = 0
    hits: list[dict] = field(default_factory=list)
    hit_loci: list[int] = field(default_factory=list)

    @classmethod
    def load_or_create(cls, path: str, genome_id: str) -> "ScanCheckpoint":
        if os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
            if data.get("genome_id") == genome_id:
                return cls(
                    path=path,
                    genome_id=genome_id,
                    next_record=data["next_record"],
                    genome_pos=data["genome_pos"],
                    hits=data["hits"],
                    hit_loci=data.get("hit_loci", []),
                )
        return cls(path=path, genome_id=genome_id)

    def record_done(self, record_idx: int, genome_pos: int, new_hits: list[FastaRecord], new_loci: list[int]) -> None:
        self.next_record = record_idx + 1
        self.genome_pos = genome_pos
        self.hits.extend(
            {"description": h.description, "seq": h.seq_str()} for h in new_hits
        )
        self.hit_loci.extend(new_loci)
        self._write()

    def _write(self) -> None:
        data = {
            "genome_id": self.genome_id,
            "next_record": self.next_record,
            "genome_pos": self.genome_pos,
            "hits": self.hits,
            "hit_loci": self.hit_loci,
        }
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(data, fh)
        os.replace(tmp, self.path)

    def restore_hits(self) -> list[FastaRecord]:
        return [FastaRecord(h["description"], h["seq"].encode()) for h in self.hits]

    def done(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
