"""Official-architecture SuperGlue: numerical equivalence between the
torch implementation (HF transformers' port of the MagicLeap graph,
available locally) and our pure-jax pipeline for the SAME converted
weights — so running the real superglue_indoor.pth is a data operation.
(reference: corelib/src/python/rtabmap_superglue.py runs the torch graph
per loop-closure candidate.)"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

SINKHORN_ITERS = 20
LAYERS = 6  # equivalence layout check uses fewer layers for speed


def _torch_model(num_layers=LAYERS):
    from transformers.models.superglue.configuration_superglue import (
        SuperGlueConfig,
    )
    from transformers.models.superglue.modeling_superglue import (
        SuperGlueForKeypointMatching,
    )

    types = (["self", "cross"] * ((num_layers + 1) // 2))[:num_layers]
    cfg = SuperGlueConfig(sinkhorn_iterations=SINKHORN_ITERS,
                          keypoint_encoder_sizes=[32, 64, 128, 256],
                          gnn_layers_types=types)
    torch.manual_seed(0)
    m = SuperGlueForKeypointMatching(cfg).eval()
    # randomize BN stats so eval-mode folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def _torch_forward(m, kpts, sc, desc, W, H):
    """Drive the transformers internals directly on two keypoint sets."""
    from transformers.models.superglue.modeling_superglue import (
        log_optimal_transport, normalize_keypoints,
    )

    with torch.no_grad():
        kn = normalize_keypoints(kpts, H, W)
        enc, _ = m.keypoint_encoder(kn, sc)
        d = desc + enc
        d, _, _ = m.gnn(d, mask=None)
        proj = m.final_projection(d)
        scores = proj[0] @ proj[1].transpose(0, 1)
        scores = scores / m.config.hidden_size ** 0.5
        Z = log_optimal_transport(scores[None], m.bin_score,
                                  iterations=SINKHORN_ITERS)
    return Z[0].numpy()


def _rand_inputs(K=24, W=320, H=240, seed=0):
    rng = np.random.default_rng(seed)
    kpts = rng.uniform([0, 0], [W, H], size=(2, K, 2)).astype(np.float32)
    sc = rng.random((2, K), np.float32)
    desc = rng.standard_normal((2, K, 256)).astype(np.float32)
    return kpts, sc, desc


def test_superglue_torch_jax_equivalence():
    import jax.numpy as jnp

    import rtabmap_tpu.models.superglue_official as SGO
    from rtabmap_tpu.models.convert import convert_superglue

    m = _torch_model()
    params = convert_superglue(m.state_dict())
    # patch the layer schedule to the test's shorter stack
    assert len(params["gnn"]["layers"]) == LAYERS
    SGO_LT = SGO.LAYER_TYPES
    SGO.LAYER_TYPES = ("self", "cross") * (LAYERS // 2)
    try:
        kpts, sc, desc = _rand_inputs()
        W, H = 320, 240
        Z_t = _torch_forward(m, torch.from_numpy(kpts),
                             torch.from_numpy(sc), torch.from_numpy(desc),
                             W, H)
        Z_j = np.asarray(SGO.superglue_apply(
            params, jnp.asarray(kpts[0]), jnp.asarray(sc[0]),
            jnp.asarray(desc[0]), jnp.asarray(kpts[1]), jnp.asarray(sc[1]),
            jnp.asarray(desc[1]), float(W), float(H),
            iters=SINKHORN_ITERS))
        np.testing.assert_allclose(Z_j, Z_t, atol=5e-4, rtol=1e-3)
    finally:
        SGO.LAYER_TYPES = SGO_LT


def test_superglue_magicleap_layout_converts_identically():
    """The MagicLeap name scheme (superglue_indoor.pth) must convert to
    the same params as the transformers scheme for identical weights."""
    from rtabmap_tpu.models.convert import convert_superglue

    m = _torch_model()
    sd = m.state_dict()
    ml = {"bin_score": sd["bin_score"]}
    for i in range(4):
        c = (0, 3, 6, 9)[i]
        ml[f"kenc.encoder.{c}.weight"] = \
            sd[f"keypoint_encoder.encoder.{i}.linear.weight"].unsqueeze(-1)
        ml[f"kenc.encoder.{c}.bias"] = \
            sd[f"keypoint_encoder.encoder.{i}.linear.bias"]
        for a, b in (("weight", "weight"), ("bias", "bias"),
                     ("running_mean", "running_mean"),
                     ("running_var", "running_var")):
            ml[f"kenc.encoder.{c + 1}.{a}"] = \
                sd[f"keypoint_encoder.encoder.{i}.batch_norm.{b}"]
    ml["kenc.encoder.12.weight"] = \
        sd["keypoint_encoder.encoder.4.weight"].unsqueeze(-1)
    ml["kenc.encoder.12.bias"] = sd["keypoint_encoder.encoder.4.bias"]
    for i in range(LAYERS):
        g, gm = f"gnn.layers.{i}", f"gnn.layers.{i}"
        for j, name in enumerate(("query", "key", "value")):
            ml[f"{gm}.attn.proj.{j}.weight"] = \
                sd[f"{g}.attention.self.{name}.weight"].unsqueeze(-1)
            ml[f"{gm}.attn.proj.{j}.bias"] = \
                sd[f"{g}.attention.self.{name}.bias"]
        ml[f"{gm}.attn.merge.weight"] = \
            sd[f"{g}.attention.output.dense.weight"].unsqueeze(-1)
        ml[f"{gm}.attn.merge.bias"] = sd[f"{g}.attention.output.dense.bias"]
        ml[f"{gm}.mlp.0.weight"] = sd[f"{g}.mlp.0.linear.weight"].unsqueeze(-1)
        ml[f"{gm}.mlp.0.bias"] = sd[f"{g}.mlp.0.linear.bias"]
        for a in ("weight", "bias", "running_mean", "running_var"):
            ml[f"{gm}.mlp.1.{a}"] = sd[f"{g}.mlp.0.batch_norm.{a}"]
        ml[f"{gm}.mlp.3.weight"] = sd[f"{g}.mlp.1.weight"].unsqueeze(-1)
        ml[f"{gm}.mlp.3.bias"] = sd[f"{g}.mlp.1.bias"]
    ml["final_proj.weight"] = \
        sd["final_projection.final_proj.weight"].unsqueeze(-1)
    ml["final_proj.bias"] = sd["final_projection.final_proj.bias"]

    p_hf = convert_superglue(m.state_dict())
    p_ml = convert_superglue(ml)

    import jax

    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_hf)[0],
            jax.tree_util.tree_flatten_with_path(p_ml)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_superglue_params_roundtrip(tmp_path):
    import jax.numpy as jnp

    import rtabmap_tpu.models.superglue_official as SGO
    from rtabmap_tpu.models.convert import convert_superglue

    m = _torch_model(num_layers=2)
    params = convert_superglue(m.state_dict())
    path = str(tmp_path / "sg.npz")
    SGO.save_params(params, path)
    back = SGO.load_params(path)
    assert len(back["gnn"]["layers"]) == 2
    np.testing.assert_allclose(np.asarray(back["kenc"]["final"]["w"]),
                               np.asarray(params["kenc"]["final"]["w"]))
    np.testing.assert_allclose(float(back["bin_score"]),
                               params["bin_score"])


def test_match_decode_identity_case():
    """Self-matching identical descriptor sets: the decoded assignment is
    (near-)identity with high scores."""
    import jax.numpy as jnp

    import rtabmap_tpu.models.superglue_official as SGO

    rng = np.random.default_rng(3)
    K = 16
    d = rng.standard_normal((K, 256)).astype(np.float32) * 3
    scores = jnp.asarray(d) @ jnp.asarray(d).T / np.sqrt(256.0)
    Z = SGO.log_optimal_transport(scores, jnp.float32(1.0), 30)
    idx, valid, sc = SGO.match_from_scores(Z)
    assert np.array_equal(np.asarray(idx), np.arange(K))
    assert np.asarray(valid).all()


def _passthrough_params(num_layers=18):
    """Analytically-constructed SuperGlue params that reduce the net to
    pure descriptor similarity: encoder contributes 0, every GNN delta is
    0, final projection is identity — isolates the matching/Sinkhorn/PnP
    wiring from (unavailable) pretrained weights."""
    import numpy as np

    def lin(o, i, w=None, b=None):
        return {"w": np.zeros((o, i), np.float32) if w is None else w,
                "b": np.zeros((o,), np.float32) if b is None else b}

    def bn(c):
        return {"gamma": np.ones((c,), np.float32),
                "beta": np.zeros((c,), np.float32),
                "mean": np.zeros((c,), np.float32),
                "var": np.ones((c,), np.float32)}

    sizes = [(32, 3), (64, 32), (128, 64), (256, 128)]
    kenc = {"blocks": [{"linear": lin(o, i), "bn": bn(o)}
                       for o, i in sizes],
            "final": lin(256, 256)}
    layers = []
    for _ in range(num_layers):
        layers.append({
            "q": lin(256, 256), "k": lin(256, 256), "v": lin(256, 256),
            "out": lin(256, 256),
            "mlp0": {"linear": lin(512, 512), "bn": bn(512)},
            "mlp1": lin(256, 512),   # zero weights -> delta 0
        })
    return {"kenc": kenc, "gnn": {"layers": layers},
            "final": lin(256, 256, w=np.eye(256, dtype=np.float32)),
            "bin_score": 1.0}


def test_superglue_registration_mode_recovers_transform():
    """Vis/CorNNType=6 end-to-end in Memory.compute_transform: SuperGlue
    assignment + PnP recovers the true transform when descriptors are
    discriminative."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.memory.memory import Memory
    from rtabmap_tpu.core.frame import FrameFeatures
    from rtabmap_tpu.utils.params import Parameters
    from rtabmap_tpu.vocab.dictionary import DESC_DIM

    CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters({"Vis/CorNNType": 6})
    mem = Memory(p, node_capacity=8, words_per_frame=64)
    mem.set_superglue(_passthrough_params())

    rng = np.random.default_rng(0)
    K = 64
    pts_a = rng.uniform([-1, -1, 2], [1, 1, 5], size=(K, 3)).astype(np.float32)
    t_true = np.eye(3, 4, dtype=np.float32)
    t_true[:, 3] = [0.2, -0.1, 0.1]
    # B sees A's points through inv(T_ab)
    import jax.numpy as jnp

    xb = np.asarray(T.apply(T.inverse(jnp.asarray(t_true))[None],
                            jnp.asarray(pts_a)[None])[0])
    uv_b = np.stack([xb[:, 0] / xb[:, 2] * 300 + 160,
                     xb[:, 1] / xb[:, 2] * 300 + 120], 1).astype(np.float32)
    uv_a = np.stack([pts_a[:, 0] / pts_a[:, 2] * 300 + 160,
                     pts_a[:, 1] / pts_a[:, 2] * 300 + 120], 1).astype(np.float32)
    descf = (rng.standard_normal((K, 256)).astype(np.float32)) * 2
    perm = rng.permutation(K)

    def mk(uv, pts, df):
        fr = FrameFeatures(
            uv=jnp.asarray(uv),
            desc=jnp.asarray(np.where(df[:, :DESC_DIM] > 0, 1, -1), jnp.int8),
            pts3d=jnp.asarray(pts), valid=jnp.ones((K,), bool),
            valid3d=jnp.ones((K,), bool), angle=jnp.zeros((K,)),
            response=jnp.zeros((K,)))
        s = mem.create_signature(fr, np.eye(3, 4, dtype=np.float32), 0.0)
        s.descf = df
        return s

    a = mk(uv_a, pts_a, descf)
    b = mk(uv_b[perm], xb[perm], descf[perm])  # shuffled: matcher must sort it
    t_ab, cov, inl = mem.compute_transform(a.id, b.id, CAM,
                                           jax.random.PRNGKey(0),
                                           min_inliers=20)
    assert t_ab is not None
    err = float(jnp.linalg.norm(T.se3_log(
        T.compose(T.inverse(jnp.asarray(t_ab)), jnp.asarray(t_true)))))
    assert err < 0.03, err
    assert inl >= 40
