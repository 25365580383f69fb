"""Deterministic synthetic inputs for end-to-end tests.

Uses the ``--ar-dir`` replay seam (reference ``ar.cpp:599-640``, SURVEY.md §4)
so tests never need raxml-ng: we fabricate a ``.raxml.ancestralProbs`` TSV and
``.raxml.ancestralTree`` newick for the extended tree with seeded random
posteriors.
"""

import os

import numpy as np

from ipk_tpu.alignment import Alignment, extend_alignment, save_alignment
from ipk_tpu.seq import SeqTraits, DNA
from ipk_tpu.tree import PhyloTree, extend_tree, parse_newick, postorder, to_newick


def random_tree_newick(rng, num_leaves: int) -> str:
    """Random rooted binary tree with num_leaves labeled leaves."""
    nodes = [f"L{i}:{rng.uniform(0.05, 1.0):.4f}" for i in range(num_leaves)]
    while len(nodes) > 1:
        i = rng.integers(0, len(nodes))
        a = nodes.pop(i)
        j = rng.integers(0, len(nodes))
        b = nodes.pop(j)
        bl = rng.uniform(0.05, 1.0)
        nodes.append(f"({a},{b}):{bl:.4f}")
    # root: strip the root's branch length
    return nodes[0].rsplit(":", 1)[0] + "root;"


def random_alignment(rng, leaf_labels, width: int,
                     traits: SeqTraits = DNA, gap_prob: float = 0.1) -> Alignment:
    seqs = []
    letters = traits.letters
    for _ in leaf_labels:
        chars = [
            "-" if rng.random() < gap_prob
            else letters[rng.integers(0, len(letters))]
            for _ in range(width)]
        seqs.append("".join(chars))
    return Alignment(list(leaf_labels), seqs)


def make_ar_tree(extended_tree: PhyloTree) -> PhyloTree:
    """AR-view of the extended tree: same topology, inner nodes relabeled
    Node0..NodeN (like raxml-ng's ancestralTree), leaves unchanged."""
    ar = extended_tree.copy()
    counter = 0
    for node in postorder(ar.root):
        if not node.is_leaf():
            node.label = f"Node{counter}"
            counter += 1
    ar.index()
    return ar


def write_ancestral_probs(filename: str, ar_tree: PhyloTree, width: int,
                          rng, traits: SeqTraits = DNA,
                          concentration: float = 0.5) -> None:
    """Synthetic .raxml.ancestralProbs: one block per internal node, one row
    per site, raxml column order (alphabetical for AA; ACGT for DNA)."""
    from ipk_tpu.ar.reader import RAXML_AA_ORDER
    sigma = traits.alphabet_size
    hdr_letters = RAXML_AA_ORDER if sigma == 20 else traits.letters
    with open(filename, "w") as f:
        # real raxml-ng header: p_A p_C p_G p_T (DNA) / raxml AA order
        f.write("Node\tSite\tState\t" +
                "\t".join(f"p_{c.upper()}" for c in hdr_letters) + "\n")
        for node in postorder(ar_tree.root):
            if node.is_leaf():
                continue
            probs = rng.dirichlet(np.ones(sigma) * concentration, size=width)
            probs = np.maximum(probs, 1e-12)
            letters = RAXML_AA_ORDER if sigma == 20 else traits.letters
            for site in range(width):
                state = letters[int(np.argmax(probs[site]))]
                row = "\t".join(f"{p:.9f}" for p in probs[site])
                f.write(f"{node.label}\t{site+1}\t{state}\t{row}\n")


def make_ar_dir(tmp_path, extended_tree: PhyloTree, width: int, seed: int = 0,
                traits: SeqTraits = DNA):
    """Create an --ar-dir with synthetic probs + tree for the extended tree."""
    rng = np.random.default_rng(seed)
    ar_dir = os.path.join(str(tmp_path), "ar_out")
    os.makedirs(ar_dir, exist_ok=True)
    ar_tree = make_ar_tree(extended_tree)
    with open(os.path.join(ar_dir, "align.raxml.ancestralTree"), "w") as f:
        f.write(to_newick(ar_tree) + "\n")
    write_ancestral_probs(os.path.join(ar_dir, "align.raxml.ancestralProbs"),
                          ar_tree, width, rng, traits)
    return ar_dir, ar_tree


def make_project(tmp_path, num_leaves=6, width=30, seed=1,
                 traits: SeqTraits = DNA):
    """Full synthetic project: tree file, alignment file, ar-dir.

    Returns (tree_file, fasta_file, ar_dir). Note: the ar-dir is generated for
    the extended tree of the *reduced* alignment width, so use
    no_reduction=True or gap-free alignments when width must match.
    """
    rng = np.random.default_rng(seed)
    newick = random_tree_newick(rng, num_leaves)
    tree_file = os.path.join(str(tmp_path), "tree.newick")
    with open(tree_file, "w") as f:
        f.write(newick + "\n")
    tree = parse_newick(newick)
    leaves = [n.label for n in postorder(tree.root) if n.is_leaf()]
    align = random_alignment(rng, leaves, width, traits, gap_prob=0.0)
    fasta_file = os.path.join(str(tmp_path), "reference.fasta")
    save_alignment(align, fasta_file, "fasta")

    extended, _ = extend_tree(tree)
    ar_dir, _ = make_ar_dir(tmp_path, extended, width, seed + 1, traits)
    return tree_file, fasta_file, ar_dir
