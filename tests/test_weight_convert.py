"""Weight-converter equivalence: the OFFICIAL torch SuperPoint
architecture (MagicLeap SuperPointNet — the exact module layout of
superpoint_v1.pt, reference superpoint_torch/SuperPoint.cc:30-90) and
our flax port must produce IDENTICAL outputs for the same converted
weights. With that proven, loading the real pretrained file is a pure
data operation (no egress exists here to fetch it)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TorchSuperPointNet(torch.nn.Module):
    """Verbatim MagicLeap SuperPointNet layout (layer names included)."""

    def __init__(self):
        super().__init__()
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        Conv = torch.nn.Conv2d
        self.relu = torch.nn.ReLU(inplace=True)
        self.pool = torch.nn.MaxPool2d(kernel_size=2, stride=2)
        self.conv1a = Conv(1, c1, 3, 1, 1)
        self.conv1b = Conv(c1, c1, 3, 1, 1)
        self.conv2a = Conv(c1, c2, 3, 1, 1)
        self.conv2b = Conv(c2, c2, 3, 1, 1)
        self.conv3a = Conv(c2, c3, 3, 1, 1)
        self.conv3b = Conv(c3, c3, 3, 1, 1)
        self.conv4a = Conv(c3, c4, 3, 1, 1)
        self.conv4b = Conv(c4, c4, 3, 1, 1)
        self.convPa = Conv(c4, c5, 3, 1, 1)
        self.convPb = Conv(c5, 65, 1, 1, 0)
        self.convDa = Conv(c4, c5, 3, 1, 1)
        self.convDb = Conv(c5, d1, 1, 1, 0)

    def forward(self, x):
        x = self.relu(self.conv1a(x))
        x = self.relu(self.conv1b(x))
        x = self.pool(x)
        x = self.relu(self.conv2a(x))
        x = self.relu(self.conv2b(x))
        x = self.pool(x)
        x = self.relu(self.conv3a(x))
        x = self.relu(self.conv3b(x))
        x = self.pool(x)
        x = self.relu(self.conv4a(x))
        x = self.relu(self.conv4b(x))
        cPa = self.relu(self.convPa(x))
        semi = self.convPb(cPa)
        cDa = self.relu(self.convDa(x))
        desc = self.convDb(cDa)
        return semi, desc


def test_superpoint_torch_flax_equivalence():
    import jax.numpy as jnp

    from rtabmap_tpu.models.convert import convert_superpoint
    from rtabmap_tpu.models.superpoint import SuperPointNet

    torch.manual_seed(0)
    tnet = TorchSuperPointNet().eval()
    params = convert_superpoint(tnet.state_dict())

    rng = np.random.default_rng(0)
    img = rng.random((1, 48, 64), np.float32)
    with torch.no_grad():
        semi_t, desc_t = tnet(torch.from_numpy(img[None]))
    semi_t = semi_t.numpy()[0].transpose(1, 2, 0)   # (Hc,Wc,65)
    desc_t = desc_t.numpy()[0].transpose(1, 2, 0)

    # float32 apply (the deployed path runs bfloat16; equivalence is
    # checked at full precision)
    net = SuperPointNet(desc_dim=256, dtype=jnp.float32)
    semi_j, desc_j = net.apply({"params": params},
                               jnp.asarray(img[0])[None, :, :, None])
    np.testing.assert_allclose(np.asarray(semi_j[0]), semi_t,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(desc_j[0]), desc_t,
                               atol=2e-4, rtol=1e-4)


def test_superpoint_convert_file_roundtrip(tmp_path):
    import torch as _torch

    from rtabmap_tpu.models.convert import convert_superpoint_file
    from rtabmap_tpu.models.superpoint import SuperPoint

    _torch.manual_seed(1)
    tnet = TorchSuperPointNet().eval()
    pt = str(tmp_path / "superpoint_v1.pt")
    _torch.save(tnet.state_dict(), pt)
    npz = str(tmp_path / "superpoint.npz")
    convert_superpoint_file(pt, npz)
    sp = SuperPoint.load_params(npz)
    rng = np.random.default_rng(2)
    g = rng.random((64, 64), np.float32)
    kps, desc, descf = sp.extract(g, max_kp=64)
    assert np.asarray(kps.valid).any()
    assert np.isfinite(np.asarray(descf)).all()


def test_superpoint_convert_rejects_wrong_layout():
    from rtabmap_tpu.models.convert import convert_superpoint

    with pytest.raises(KeyError):
        convert_superpoint({"encoder.0.weight": np.zeros((64, 1, 3, 3))})


def test_netvlad_convert():
    from rtabmap_tpu.models.convert import convert_netvlad
    from rtabmap_tpu.models.netvlad import NetVLAD

    cent = np.random.default_rng(0).standard_normal((64, 256)).astype(np.float32)
    out = convert_netvlad({"net_vlad.centroids": cent, "alpha": 12.0})
    np.testing.assert_array_equal(out["codebook"], cent)
    assert out["alpha"] == 12.0
    nv = NetVLAD(codebook=out["codebook"], alpha=out["alpha"])
    import jax.numpy as jnp

    d = jnp.asarray(np.random.default_rng(1).standard_normal((128, 256)),
                    jnp.float32)
    v = nv.extract(d, jnp.ones((128,), bool))
    assert np.isfinite(np.asarray(v)).all()
