"""Serving app end-to-end smoke (HTTP API: image -> mask -> export ->
caption) on the tiny model."""

import os

import pytest

TOKENIZER_DIR = "/root/reference/modeling/tokenizer"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(TOKENIZER_DIR, "tokenizer.model")),
    reason="tokenizer asset not available")
def test_app_smoke():
    from ullsam_tpu.serve.app import main

    with pytest.raises(SystemExit) as exc:
        main(["--tiny", "--smoke", "--engine", "--port", "19731",
              "--tokenizer_path", TOKENIZER_DIR,
              "--dtype", "float32", "--max_len", "512"])
    assert exc.value.code == 0


def test_session_state_workflow():
    import numpy as np

    from ullsam_tpu.serve.state import Session, export_instance_mask

    s = Session()
    img = (np.random.RandomState(0).rand(50, 80, 3) * 255).astype(np.uint8)
    s.set_image(img, target=128)
    assert s.display.shape == (128, 128, 3)
    assert s.geometry["orig_hw"] == (50, 80)
    s.add_point(10, 20, 1)
    s.current_mask = np.zeros((128, 128), bool)
    s.current_mask[30:60, 30:60] = True
    inst = s.save_instance()
    assert inst == 1 and s.points == []
    out = export_instance_mask(s.instances, s.geometry)
    assert out.shape == (50, 80) and out.dtype == np.uint16
    tiff = s.export_tiff()
    assert tiff[:2] in (b"II", b"MM")
    s.reset_instances()
    assert s.instances.max() == 0
