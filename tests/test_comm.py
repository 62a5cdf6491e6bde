import numpy as np

from cpd_tpu.parallel import comm


def test_single_process_paths():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    comm.synchronize()
    out = comm.all_gather_arrays(np.arange(4))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], np.arange(4))
    assert comm.average_reduce_value(3.5) == 3.5
    d = comm.reduce_dict({"a": 1.0, "b": 2.0})
    assert d == {"a": 1.0, "b": 2.0}


def test_merge_results_dist(tmp_path):
    merged = comm.merge_results_dist([1, 2, 3, 4], size=3, tmpdir=tmp_path)
    assert merged == [1, 2, 3]
