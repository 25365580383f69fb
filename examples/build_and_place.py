#!/usr/bin/env python3
"""End-to-end example: build a phylo-k-mer database and place reads.

Uses the committed golden fixture project (tests/data/golden/D-dna) so it
runs hermetically — no raxml-ng needed (ancestral reconstruction is replayed
through the --ar-dir seam). Swap in your own FASTA/newick and drop --ar-dir
to run real ancestral reconstruction.

Run from the repository root:
    python examples/build_and_place.py
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ipk_tpu import serialize                                  # noqa: E402
from ipk_tpu.alignment import read_fasta                       # noqa: E402
from ipk_tpu.pipeline import BuildParams, build_database       # noqa: E402
from ipk_tpu.placement import place_queries, write_jplace      # noqa: E402
from ipk_tpu.seq import decode_kmer, DNA                       # noqa: E402

project = os.path.join(REPO, "tests", "data", "golden", "D-dna")
workdir = tempfile.mkdtemp(prefix="ipk_example_")

# ---- 1. build the database -------------------------------------------------
result = build_database(BuildParams(
    refalign=os.path.join(project, "reference.fasta"),
    reftree=os.path.join(project, "tree.newick"),
    states="nucl",
    working_dir=workdir,
    ar_dir=os.path.join(project, "ar_out"),   # replay committed AR outputs
    kmer_size=7,
    omega=2.0,
    output_filename=os.path.join(workdir, "DB.ipk"),
    verbosity=1,
))
db = result.db
print(f"\nDatabase: {db.size()} k-mers, {db.num_entries()} entries")

# ---- 2. inspect it ---------------------------------------------------------
key, entries = next(iter(db))
print(f"most informative k-mer: {decode_kmer(key, db.kmer_size, DNA)}")
for branch, score in entries[:3]:
    print(f"   branch {branch}: score 10^{score:.3f}")

# ---- 3. reload from disk and place the reference sequences -----------------
loaded = serialize.load(os.path.join(workdir, "DB.ipk"))
queries = read_fasta(os.path.join(project, "reference.fasta"))
placements = place_queries(loaded, queries, top=3)
jplace_path = os.path.join(workdir, "placements.jplace")
write_jplace(loaded, placements, jplace_path)

doc = json.load(open(jplace_path))
print(f"\nPlaced {len(doc['placements'])} queries -> {jplace_path}")
first = doc["placements"][0]
print(f"query {first['n'][0]}: best edge {first['p'][0][0]} "
      f"(weight {first['p'][0][2]:.2f})")
