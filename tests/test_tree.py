"""Tests for newick IO, tree indexing, ghost extension, rerooting
(SURVEY.md §7.1 invariants #3, #4, #8)."""

import pytest

from ipk_tpu.tree import (PhyloNode, PhyloTree, extend_tree, load_newick,
                          parse_newick, postorder, preprocess_tree,
                          reroot_tree, to_newick)

NEWICK = "((c:1.0,d:2.0)a:0.5,b:3.0)root;"


def test_parse_and_roundtrip():
    tree = parse_newick(NEWICK)
    assert tree.get_node_count() == 5
    # branch lengths are written in shortest round-trip form
    assert to_newick(tree) == "((c:1,d:2)a:0.5,b:3)root;"
    # stable under re-parse
    assert to_newick(parse_newick(to_newick(tree))) == to_newick(tree)


def test_postorder_ids():
    tree = parse_newick(NEWICK)
    labels = [n.label for n in tree.nodes_postorder()]
    # children-first, in stored order
    assert labels == ["c", "d", "a", "b", "root"]
    assert tree.get_by_postorder_id(2).label == "a"
    assert tree.root.postorder_id == 4


def test_preorder_ids():
    tree = parse_newick(NEWICK)
    by_pre = sorted(tree.nodes_postorder(), key=lambda n: n.preorder_id)
    assert [n.label for n in by_pre] == ["root", "a", "c", "d", "b"]


def test_subtree_stats():
    tree = parse_newick(NEWICK)
    a = tree.get_by_label("a")
    assert a.num_leaves == 2
    assert a.num_nodes == 3
    assert a.subtree_branch_length() == pytest.approx(3.0)
    assert tree.root.num_nodes == 5


def test_is_rooted():
    assert parse_newick(NEWICK).is_rooted()
    assert not parse_newick("(a:1,b:1,c:1);").is_rooted()


def test_extend_tree_structure():
    tree = parse_newick(NEWICK)
    ext, mapping = extend_tree(tree)
    # every non-root node (4 of them) gains 4 ghosts: 5 + 16 = 21 nodes
    assert ext.get_node_count() == 21
    # ghost counter starts at node_count+1 = 6 (extended_tree.cpp:79-82),
    # assigned in postorder over non-root nodes: c, d, a, b
    assert mapping["6_X0"] == 0 and mapping["7_X1"] == 0     # c
    assert mapping["10_X0"] == 1 and mapping["11_X1"] == 1   # d
    assert mapping["14_X0"] == 2 and mapping["15_X1"] == 2   # a
    assert mapping["18_X0"] == 3 and mapping["19_X1"] == 3   # b
    assert len(mapping) == 8  # X2/X3 are not in the mapping

    # structure: root's children are now X0 ghosts, order preserved
    assert [c.label for c in ext.root.children] == ["14_X0", "18_X0"]
    x0_a = ext.root.children[0]
    assert [c.label for c in x0_a.children] == ["15_X1", "a"]
    x1_a = x0_a.children[0]
    assert [c.label for c in x1_a.children] == ["16_X2", "17_X3"]
    assert x1_a.children[0].branch_length == pytest.approx(0.01)


def test_ghost_branch_lengths_leaf():
    tree = parse_newick(NEWICK)
    ext, _ = extend_tree(tree)
    # leaf b: bl 3.0 -> X0 = 1.5, X1 = residual = 1.5, b = 1.5
    x0_b = ext.get_by_label("18_X0")
    assert x0_b.branch_length == pytest.approx(1.5)
    assert ext.get_by_label("19_X1").branch_length == pytest.approx(1.5)
    assert ext.get_by_label("b").branch_length == pytest.approx(1.5)


def test_ghost_branch_lengths_inner():
    tree = parse_newick(NEWICK)
    ext, _ = extend_tree(tree)
    # inner a: bl 0.5 -> X0 = 0.25, residual 0.25
    # total_branch_length(a) = bl(c) + bl(d) = 3.0 (leaves), minus
    # num_leaves*bl(a) contribution excluded by construction
    # X1 = (3.0 + 0.25*2)/2 = 1.75  (extended_tree.cpp:59-72)
    assert ext.get_by_label("14_X0").branch_length == pytest.approx(0.25)
    assert ext.get_by_label("15_X1").branch_length == pytest.approx(1.75)
    assert ext.get_by_label("a").branch_length == pytest.approx(0.25)


def test_ghost_postorder_group_order():
    """Group order = first-ghost occurrence in EXTENDED postorder: X1 before
    X0, groups NOT in original-postorder order (see db_builder.cpp:576-627)."""
    tree = parse_newick(NEWICK)
    ext, mapping = extend_tree(tree)
    ghosts = [n.label for n in ext.nodes_postorder()
              if n.label.endswith("_X0") or n.label.endswith("_X1")]
    seen = []
    for g in ghosts:
        pid = mapping[g]
        if pid not in seen:
            seen.append(pid)
    # extended postorder visits a's X1 before descending into c/d
    assert seen == [2, 0, 1, 3]


def test_reroot_trifurcation():
    tree = parse_newick("(a:1.0,b:1.0,c:1.0);")
    reroot_tree(tree)
    assert tree.root.label == "added_root"
    assert len(tree.root.children) == 2
    # ((b,c),a)added_root
    first, second = tree.root.children
    assert [c.label for c in first.children] == ["b", "c"]
    assert second.label == "a"


def test_reroot_noop_when_rooted():
    tree = parse_newick(NEWICK)
    reroot_tree(tree)
    assert tree.root.label == "root"


def test_preprocess_tree_requires_rooted(tmp_path):
    p = tmp_path / "t.nwk"
    p.write_text("(a:1,b:1,c:1);")
    with pytest.raises(RuntimeError):
        preprocess_tree(str(p), use_unrooted=False)
    orig, ext, mapping = preprocess_tree(str(p), use_unrooted=True)
    assert orig.get_node_count() == 4
    assert ext.get_node_count() == 4 + 3 * 4


def test_quoted_labels():
    tree = parse_newick("('sp one':1.0,b:2.0)r;")
    assert tree.get_by_label("sp one") is not None
