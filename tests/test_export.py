"""jax.export round-trip of the prompt decoder (utils/onnx.py analog)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_export_decoder_roundtrip():
    from tests.test_amg import TINY_SAM
    from ullsam_tpu.inference.export import (export_decoder,
                                             load_exported_decoder)
    from ullsam_tpu.models.sam import sam as S

    params = S.sam_init(jax.random.PRNGKey(0), TINY_SAM)
    blob = export_decoder(params, TINY_SAM, num_points=2, batch=1)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_exported_decoder(bytes(blob))
    emb = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16), jnp.float32)
    coords = jnp.asarray([[[10.0, 20.0], [40.0, 50.0]]], jnp.float32)
    labels = jnp.asarray([[1, 0]], jnp.int32)
    masks, iou = fn(emb, coords, labels)
    ref_masks, ref_iou = S.decode_masks(params, TINY_SAM, emb,
                                        points=(coords, labels),
                                        multimask_output=True)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               atol=1e-5)
