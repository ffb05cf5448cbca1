"""Full-workflow rehearsal test (round-3 VERDICT item 2): one synthetic
corpus through all seven reference CLI stages in sequence, asserting the
artifact format at every boundary. The stage chain and assertions live in
`examples/full_pipeline.py`; the reference user's actual loop is
`extract_C3D_features_script.py:12-21` -> `train_gaze.py:137` ->
`evaluate_gaze.py:287` -> `extract_map.py:241` ->
`create_tfrecords.py:157` -> `action_classification.py:384`.
"""

import os
import sys

import pytest

# ~7 min on the virtual-CPU harness: deselected by default (pyproject
# addopts -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_full_pipeline_seven_stage_rehearsal(tmp_path):
    import full_pipeline

    artifacts = full_pipeline.run(str(tmp_path))
    # run() asserts every boundary; spot-check the terminal artifacts here
    assert os.path.isfile(artifacts["overall"])
    assert os.path.isfile(artifacts["action_scores"])
    assert os.listdir(artifacts["records_dir"])
