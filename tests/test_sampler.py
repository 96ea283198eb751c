"""TwoStreamBatchSampler semantics (dataset.py:205-253)."""
from icl_tpu.data.sampler import TwoStreamBatchSampler, two_stream_batches


def test_layout_and_epoch_length():
    labeled = list(range(10))
    unlabeled = list(range(10, 50))
    s = TwoStreamBatchSampler(labeled, unlabeled, batch_size=8, secondary_batch_size=4, seed=0)
    assert len(s) == 10 // 4  # primary_bs = 8 - 4 = 4
    batches = list(iter(s))
    assert len(batches) == 2
    for b in batches:
        assert len(b) == 8
        assert all(i < 10 for i in b[:4]), "labeled prefix"
        assert all(i >= 10 for i in b[4:]), "unlabeled suffix"


def test_primary_once_per_epoch():
    labeled = list(range(8))
    s = TwoStreamBatchSampler(labeled, list(range(8, 20)), 6, 2, seed=1)
    seen = [i for b in iter(s) for i in b[:4]]
    assert len(seen) == len(set(seen)) == 8


def test_secondary_stream_carries_across_epochs():
    """The eternal secondary stream must not restart each epoch: within
    one permutation cycle there are no repeats."""
    labeled = list(range(4))
    unlabeled = list(range(100, 112))  # 12 items
    gen = two_stream_batches(labeled, unlabeled, 4, 2, seed=2)
    seen = []
    for _ in range(6):  # 6 batches × 2 secondary = 12 = one full cycle
        b = next(gen)
        seen.extend(b[2:])
    assert sorted(seen) == sorted(unlabeled)


def test_deterministic_given_seed():
    a = [next(two_stream_batches([0, 1, 2, 3], [4, 5, 6, 7], 4, 2, seed=7)) for _ in range(1)]
    b = [next(two_stream_batches([0, 1, 2, 3], [4, 5, 6, 7], 4, 2, seed=7)) for _ in range(1)]
    assert a == b
