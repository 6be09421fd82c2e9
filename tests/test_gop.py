"""GOP structure engine tests.

Expected structures transcribed from the reference generator's semantics
(reference: src/func_util/GOP_structure.py:27-137).
"""

import pytest

from aivc_tpu.config import FRAME_B, FRAME_I, FRAME_P
from aivc_tpu.gop import frame_at_coding_order, generate_gop_struct


def test_all_intra():
    gop = generate_gop_struct("1_GOP_0")
    assert len(gop) == 1
    f = gop.frames[0]
    assert f.frame_type == FRAME_I
    assert f.prev_ref is None and f.next_ref is None
    assert f.coding_order == 0


def test_ldp():
    gop = generate_gop_struct("LDP_4")
    assert len(gop) == 5
    assert gop.by_idx[0].frame_type == FRAME_I
    for i in range(1, 5):
        f = gop.by_idx[i]
        assert f.frame_type == FRAME_P
        assert f.prev_ref == i - 1
        assert f.next_ref is None
        assert f.coding_order == i


def test_ra_gop4_matches_reference_recursion():
    # generate_ra_gop(4): I(0)@0, P(4)@1, B(2)@2 refs (0,4),
    # B(1)@3 refs (0,2), B(3)@4 refs (2,4)
    gop = generate_gop_struct("1_GOP_4")
    expect = {
        0: (FRAME_I, None, None, 0),
        4: (FRAME_P, 0, None, 1),
        2: (FRAME_B, 0, 4, 2),
        1: (FRAME_B, 0, 2, 3),
        3: (FRAME_B, 2, 4, 4),
    }
    assert len(gop) == 5
    for idx, (t, p, n, o) in expect.items():
        f = gop.by_idx[idx]
        assert (f.frame_type, f.prev_ref, f.next_ref, f.coding_order) == (t, p, n, o)


def test_ra_gop8_preorder_coding_order():
    gop = generate_gop_struct("1_GOP_8")
    # Pre-order DFS: 4, then left subtree (2,1,3), then right (6,5,7)
    order_to_idx = [frame_at_coding_order(gop, o).idx for o in range(len(gop))]
    assert order_to_idx == [0, 8, 4, 2, 1, 3, 6, 5, 7]


def test_chained_gop_shifts_everything():
    gop = generate_gop_struct("2_GOP_4")
    assert len(gop) == 9  # 5 + 4 (chained GOP drops its I frame)
    # Second GOP's P frame: display 8, refs prev=4, coding order 1+4=5
    f8 = gop.by_idx[8]
    assert (f8.frame_type, f8.prev_ref, f8.coding_order) == (FRAME_P, 4, 5)
    f6 = gop.by_idx[6]
    assert (f6.frame_type, f6.prev_ref, f6.next_ref, f6.coding_order) == (
        FRAME_B, 4, 8, 6)
    # Coding orders are a permutation of 0..8
    orders = sorted(f.coding_order for f in gop.frames)
    assert orders == list(range(9))


def test_waves_respect_dependencies_and_expose_parallelism():
    gop = generate_gop_struct("1_GOP_16")
    waves = gop.waves()
    decoded = set()
    for wave in waves:
        for f in wave:
            if f.prev_ref is not None:
                assert f.prev_ref in decoded
            if f.next_ref is not None:
                assert f.next_ref in decoded
        decoded.update(f.idx for f in wave)
    assert decoded == {f.idx for f in gop.frames}
    # Hierarchical-B GOP16: waves sizes 1(I),1(P),1,2,4,8
    assert [len(w) for w in waves] == [1, 1, 1, 2, 4, 8]


def test_ldp_waves_are_sequential():
    gop = generate_gop_struct("LDP_8")
    assert [len(w) for w in gop.waves()] == [1] * 9


@pytest.mark.parametrize("name,n", [
    ("1_GOP_32", 33), ("2_GOP_16", 33), ("4_GOP_8", 33), ("LDP_32", 33),
])
def test_sizes(name, n):
    assert len(generate_gop_struct(name)) == n


def test_large_ra_gop64():
    gop = generate_gop_struct("1_GOP_64")
    assert len(gop) == 65
    assert [len(w) for w in gop.waves()] == [1, 1, 1, 2, 4, 8, 16, 32]


def test_large_ldp_and_chained():
    assert len(generate_gop_struct("LDP_1000")) == 1001
    gop = generate_gop_struct("16_GOP_32")  # intra period 512
    assert len(gop) == 16 * 32 + 1
    orders = sorted(f.coding_order for f in gop.frames)
    assert orders == list(range(len(gop)))
