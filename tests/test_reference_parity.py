"""Parity against the ACTUAL reference code (not a hand-built mirror).

tests/_reference.py imports /root/reference's own modules
(successive_ddnm_diffusion.py = "sdd", depth_correction.py = "dc") with
sys.modules stubs for their unavailable deps; random weights from the real
``Unet``/``MaskUnet`` flow through utils.torch_port into our Flax models,
and every compared quantity is produced by the reference's own code:

- geometry ops: depth2pc/pc2depth/reproject/occlusion_filter/image_condition
  (sdd:176-508) vs core.geometry
- schedule/buffer tables: GaussianDiffusion registers (sdd:1047-1151)
- Unet forward (sdd:802-964) and MaskUnet forward (dc:807-906)
- full DDIM+DDNM sampling chain incl. refine step (sdd:1319-1392)
- p_losses with injected noise (sdd:1464-1497)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.utils import torch_port

from _reference import load_reference


@pytest.fixture(scope="module")
def ref():
    sdd, dc = load_reference()
    return {"sdd": sdd, "dc": dc}


def _rand_pose(rng, b):
    """Small random SE(3) batch (host, scipy)."""
    from scipy.spatial.transform import Rotation

    pose = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    pose[:, :3, :3] = Rotation.from_euler(
        "xyz", rng.uniform(-0.15, 0.15, size=(b, 3))).as_matrix()
    pose[:, :3, 3] = rng.uniform(-0.1, 0.1, size=(b, 3))
    return pose


def _rand_depth(rng, b, h, w):
    d = rng.uniform(0.5, 4.0, size=(b, h, w)).astype(np.float32)
    d[:, : h // 4] = 0.0          # invalid band
    d[0, -2:, -2:] = 50.0         # out-of-clip values
    return d


def _intr(b, h, w):
    intr = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    intr[:, 0, 0] = 40.0
    intr[:, 1, 1] = 42.0
    intr[:, 0, 2] = w / 2.0
    intr[:, 1, 2] = h / 2.0
    return intr


class TestGeometryParity:
    B, H, W = 3, 24, 32

    def test_depth2pc(self, ref, rng):
        sdd = ref["sdd"]
        d = _rand_depth(rng, self.B, self.H, self.W)
        intr = _intr(self.B, self.H, self.W)
        ref_pc, ref_valid = sdd.depth2pc_tensor(
            torch.tensor(d)[:, None], torch.tensor(intr), clip=[0, 10])
        pc, valid = G.depth_to_points(jnp.asarray(d), jnp.asarray(intr),
                                      clip=(0.0, 10.0))
        np.testing.assert_array_equal(np.asarray(valid), ref_valid.numpy())
        v = ref_valid.numpy()
        np.testing.assert_allclose(
            np.asarray(pc)[v], ref_pc.numpy()[v], atol=1e-5, rtol=1e-5)

    def test_pc2depth_zbuffer(self, ref, rng):
        sdd = ref["sdd"]
        # clustered points force many pixel collisions -> exercises the
        # scatter-amin tie semantics (sdd:252-259)
        n = 4096
        pc = rng.normal(0, 0.15, size=(self.B, n, 3)).astype(np.float32)
        pc[..., 2] = rng.uniform(0.3, 5.0, size=(self.B, n))
        valid = rng.uniform(size=(self.B, n)) > 0.2
        intr = _intr(self.B, self.H, self.W)
        ref_d, ref_m = sdd.pc2depth_tensor(
            torch.tensor(pc), torch.tensor(valid), torch.tensor(intr),
            image_size=[self.H, self.W])
        d, m = G.points_to_depth(jnp.asarray(pc), jnp.asarray(valid),
                                 jnp.asarray(intr),
                                 image_size=(self.H, self.W))
        np.testing.assert_array_equal(np.asarray(m), ref_m.numpy()[:, 0])
        np.testing.assert_allclose(np.asarray(d), ref_d.numpy()[:, 0],
                                   atol=1e-6)

    def test_reproject_and_occlusion_filter(self, ref, rng):
        sdd = ref["sdd"]
        d = _rand_depth(rng, self.B, self.H, self.W)
        intr = _intr(self.B, self.H, self.W)
        pose = _rand_pose(rng, self.B)
        ref_d, ref_m = sdd.reproject_tensor(
            torch.tensor(d)[:, None], torch.tensor(intr), torch.tensor(pose))
        d_j, m_j = G.reproject(jnp.asarray(d), jnp.asarray(intr),
                               jnp.asarray(pose))
        np.testing.assert_array_equal(np.asarray(m_j), ref_m.numpy()[:, 0])
        np.testing.assert_allclose(np.asarray(d_j), ref_d.numpy()[:, 0],
                                   atol=1e-5)

        ref_f, _ = sdd.occlusion_filter(ref_d, ref_m)
        f_j, _ = G.occlusion_filter(d_j, m_j)
        np.testing.assert_allclose(np.asarray(f_j), ref_f.numpy()[:, 0],
                                   atol=1e-5)

    def test_image_condition_and_mask(self, ref, rng):
        sdd = ref["sdd"]
        d01 = _rand_depth(rng, self.B, self.H, self.W) / 10.0
        intr = _intr(self.B, self.H, self.W)
        pose = _rand_pose(rng, self.B)
        ref_cond = sdd.image_condition(
            torch.tensor(d01)[:, None], torch.tensor(intr),
            torch.tensor(pose), use_occlusion_filter=True)
        cond = G.image_condition(jnp.asarray(d01), jnp.asarray(intr),
                                 jnp.asarray(pose),
                                 use_occlusion_filter=True)
        np.testing.assert_allclose(
            np.asarray(cond), ref_cond.numpy().transpose(0, 2, 3, 1),
            atol=1e-5)
        ref_mask = sdd.get_mask_from_img_cond(ref_cond)
        mask = G.mask_from_image_condition(cond)
        np.testing.assert_array_equal(np.asarray(mask),
                                      ref_mask.numpy()[:, 0])

    def test_intrinsic_transform(self, ref):
        sdd = ref["sdd"]
        intr = np.array([[585.0, 0, 320.0], [0, 585.0, 240.0], [0, 0, 1.0]])
        for resize, crop in [(256, 256), ((256, 341), 256), (300, None)]:
            ref_out = sdd.intrinsic_transform(intr, resize=resize,
                                              centercrop=crop)
            out = G.intrinsic_transform(intr, resize=resize, centercrop=crop)
            np.testing.assert_allclose(out, ref_out, atol=1e-6)

    def test_intrinsic_transform_crop_only_fixes_reference_typo(self, ref):
        """With resize=None the reference's ``new_cy = old_cx`` typo (sdd:66)
        survives to the output (every production call passes resize, so the
        bug is latent there). We implement the corrected behavior: cy stays
        cy. Assert both the fix and the documented divergence."""
        sdd = ref["sdd"]
        intr = np.array([[585.0, 0, 320.0], [0, 585.0, 240.0], [0, 0, 1.0]])
        out = G.intrinsic_transform(intr, centercrop=128)
        assert out[0, 2] == pytest.approx(320.0 - (640 - 128) // 2)
        assert out[1, 2] == pytest.approx(240.0 - (480 - 128) // 2)
        ref_out = sdd.intrinsic_transform(intr, centercrop=128)
        assert ref_out[1, 2] != out[1, 2]  # the reference bug, reproduced


class TestScheduleTableParity:
    @pytest.mark.parametrize("schedule", ["linear", "cosine", "sigmoid"])
    @pytest.mark.parametrize("objective", ["pred_x0", "pred_noise"])
    def test_buffers(self, ref, schedule, objective):
        sdd = ref["sdd"]
        T = 100
        tmodel = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                          channels=1)
        rdiff = sdd.GaussianDiffusion(
            tmodel, image_size=16, timesteps=T, sampling_timesteps=8,
            loss_type="l1", objective=objective, beta_schedule=schedule,
            ddim_sampling_eta=0.0)
        ours = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: x, image_size=16, timesteps=T,
            sampling_timesteps=8, objective=objective,
            beta_schedule=schedule, ddim_sampling_eta=0.0)
        tb = ours.tables
        for name, mine in [
            ("betas", tb.betas),
            ("alphas_cumprod", tb.alphas_cumprod),
            ("alphas_cumprod_prev", tb.alphas_cumprod_prev),
            ("sqrt_alphas_cumprod", tb.sqrt_alphas_cumprod),
            ("sqrt_one_minus_alphas_cumprod",
             tb.sqrt_one_minus_alphas_cumprod),
            ("sqrt_recip_alphas_cumprod", tb.sqrt_recip_alphas_cumprod),
            ("sqrt_recipm1_alphas_cumprod", tb.sqrt_recipm1_alphas_cumprod),
            ("posterior_variance", tb.posterior_variance),
            ("posterior_log_variance_clipped",
             tb.posterior_log_variance_clipped),
            ("posterior_mean_coef1", tb.posterior_mean_coef1),
            ("posterior_mean_coef2", tb.posterior_mean_coef2),
            ("loss_weight", tb.loss_weight),
        ]:
            theirs = getattr(rdiff, name).numpy()
            np.testing.assert_allclose(mine, theirs, atol=2e-6, rtol=2e-6,
                                       err_msg=name)
        np.testing.assert_allclose(ours._ddnm_dropouts,
                                   rdiff.ddnm_dropouts.numpy(), atol=1e-7)
        np.testing.assert_allclose(ours._denoise_dropouts,
                                   rdiff.denoise_dropouts.numpy(), atol=1e-7)


@pytest.fixture(scope="module")
def ported_unet(ref):
    """Real reference Unet + our DiffusionUNet with its ported weights."""
    sdd = ref["sdd"]
    torch.manual_seed(11)
    tmodel = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                      channels=1).eval()
    jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
    params = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                         jnp.zeros((1,)), jnp.zeros((1, 4)))
    ported = torch_port.port_diffusion_unet(tmodel.state_dict(), params,
                                            num_stages=2)
    return tmodel, jmodel, ported


class TestRealUnetParity:
    def test_forward(self, ported_unet, rng):
        tmodel, jmodel, ported = ported_unet
        x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
        pc = np.array([[585.0, 585.0, 128.0, 128.0],
                       [300.0, 310.0, 120.0, 130.0]], np.float32)
        for t in (0.0, 37.0, 99.0):
            tt = np.full((2,), t, np.float32)
            with torch.no_grad():
                ref_out = tmodel(torch.tensor(x).permute(0, 3, 1, 2),
                                 torch.tensor(tt), torch.tensor(pc))
            ours = jmodel.apply(ported, jnp.asarray(x), jnp.asarray(tt),
                                jnp.asarray(pc))
            np.testing.assert_allclose(
                np.asarray(ours), ref_out.permute(0, 2, 3, 1).numpy(),
                atol=2e-4, rtol=1e-3)


class TestRealUnetOptionalFlagsParity:
    """The dormant constructor surface (sdd:811-815, 836-843): Fourier-
    feature time embeddings and the 2x-channel learned-variance head, wired
    and checked against the real reference code with ported weights."""

    def _compare(self, ref, rng, **flags):
        sdd = ref["sdd"]
        torch.manual_seed(17)
        tmodel = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                          channels=1, **flags).eval()
        jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1, **flags)
        params = jmodel.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                             jnp.zeros((1, 4)))
        ported = torch_port.port_diffusion_unet(tmodel.state_dict(), params,
                                                num_stages=2)
        x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
        pc = np.array([[585.0, 585.0, 128.0, 128.0],
                       [300.0, 310.0, 120.0, 130.0]], np.float32)
        tt = np.full((2,), 37.0, np.float32)
        with torch.no_grad():
            ref_out = tmodel(torch.tensor(x).permute(0, 3, 1, 2),
                             torch.tensor(tt), torch.tensor(pc))
        ours = jmodel.apply(ported, jnp.asarray(x), jnp.asarray(tt),
                            jnp.asarray(pc))
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-3)
        return ours

    def test_learned_sinusoidal(self, ref, rng):
        self._compare(ref, rng, learned_sinusoidal_cond=True)

    def test_random_fourier(self, ref, rng):
        self._compare(ref, rng, random_fourier_features=True)

    def test_learned_variance_head(self, ref, rng):
        out = self._compare(ref, rng, learned_variance=True)
        assert out.shape[-1] == 2

    def test_random_fourier_weights_get_zero_grad(self, ref, rng):
        """Frozen-random frequencies: torch keeps requires_grad=False; ours
        stop_gradient -> exactly zero gradient, so any optimizer leaves
        them untouched."""
        jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                               random_fourier_features=True)
        params = jmodel.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                             jnp.zeros((1, 4)))

        def loss(p):
            out = jmodel.apply(p, jnp.ones((1, 16, 16, 1)),
                               jnp.full((1,), 3.0), jnp.ones((1, 4)))
            return jnp.sum(out**2)

        grads = jax.grad(loss)(params)
        g = grads["params"]["time_pos_emb"]["weights"]
        np.testing.assert_array_equal(np.asarray(g), 0.0)
        # ... while the learned variant does receive gradient
        jmodel2 = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                                learned_sinusoidal_cond=True)
        params2 = jmodel2.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                               jnp.zeros((1, 4)))

        def loss2(p):
            out = jmodel2.apply(p, jnp.ones((1, 16, 16, 1)),
                                jnp.full((1,), 3.0), jnp.ones((1, 4)))
            return jnp.sum(out**2)

        g2 = jax.grad(loss2)(params2)["params"]["time_pos_emb"]["weights"]
        assert np.any(np.asarray(g2) != 0.0)


class TestRealMaskUnetParity:
    def test_forward(self, ref, rng):
        dc = ref["dc"]
        torch.manual_seed(13)
        tmodel = dc.MaskUnet(dim=8, dim_mults=(1, 2)).eval()
        jmodel = MaskUNet(dim=8, dim_mults=(1, 2))
        params = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        ported = torch_port.port_mask_unet(tmodel.state_dict(), params,
                                           num_stages=2)
        x = rng.uniform(0, 1, size=(2, 16, 16, 1)).astype(np.float32)
        x[0, :5, :5, 0] = 0.0  # invalid region exercises DepthAugment
        with torch.no_grad():
            ref_out = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
        ours = jmodel.apply(ported, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-3)


class TestRealChainParity:
    """Full DDIM+DDNM sampling chain vs the reference's own ddim_sample
    (sdd:1319-1392): eta=0 so the only RNG draw that matters is x_T, which is
    captured by pre-drawing under the same torch seed the reference call
    reuses."""

    T, S = 100, 8

    def _setup(self, ref, ported_unet, eta=0.0):
        sdd = ref["sdd"]
        tmodel, jmodel, ported = ported_unet
        rdiff = sdd.GaussianDiffusion(
            tmodel, image_size=16, timesteps=self.T,
            sampling_timesteps=self.S, loss_type="l1", objective="pred_x0",
            beta_schedule="sigmoid", ddim_sampling_eta=eta).eval()
        ours = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: jmodel.apply(p, x, t, pc),
            image_size=16, timesteps=self.T, sampling_timesteps=self.S,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=eta)
        return rdiff, ours, ported

    def _cond(self, rng):
        pc = np.array([[300.0, 300.0, 128.0, 128.0]] * 2, np.float32)
        cond01 = np.stack(
            [np.full((2, 16, 16), 0.55, np.float32),
             (rng.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)],
            axis=-1)
        return pc, cond01 * 2.0 - 1.0  # NHWC, [-1, 1]

    @pytest.mark.parametrize("refine", [False, True])
    def test_ddnm_chain(self, ref, ported_unet, rng, refine):
        rdiff, ours, ported = self._setup(ref, ported_unet)
        pc, cond = self._cond(rng)
        tcond = torch.tensor(cond).permute(0, 3, 1, 2)

        torch.manual_seed(101)
        x_init = torch.randn((2, 1, 16, 16))
        torch.manual_seed(101)  # the reference re-draws the same x_T
        with torch.no_grad():
            ref_out = rdiff.sample(param_cond=torch.tensor(pc),
                                   img_cond=tcond, disable_tqdm=True,
                                   has_refine_step=refine)

        out = ours.sample(
            ported, jax.random.PRNGKey(3), param_cond=jnp.asarray(pc),
            img_cond=jnp.asarray(cond), has_refine_step=refine,
            x_init=jnp.asarray(x_init.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(out), ref_out.permute(0, 2, 3, 1).numpy(),
            atol=1e-3, rtol=1e-3)

    def test_unconditional_chain(self, ref, ported_unet):
        rdiff, ours, ported = self._setup(ref, ported_unet)
        pc = np.array([[585.0, 585.0, 128.0, 128.0]], np.float32)
        torch.manual_seed(7)
        x_init = torch.randn((1, 1, 16, 16))
        torch.manual_seed(7)
        with torch.no_grad():
            ref_out = rdiff.sample(param_cond=torch.tensor(pc),
                                   img_cond=None, disable_tqdm=True)
        out = ours.sample(
            ported, jax.random.PRNGKey(4), param_cond=jnp.asarray(pc),
            img_cond=None,
            x_init=jnp.asarray(x_init.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(out), ref_out.permute(0, 2, 3, 1).numpy(),
            atol=1e-3, rtol=1e-3)


class TestRealLossParity:
    def test_p_losses_injected_noise(self, ref, ported_unet, rng):
        sdd = ref["sdd"]
        tmodel, jmodel, ported = ported_unet
        rdiff = sdd.GaussianDiffusion(
            tmodel, image_size=16, timesteps=100, sampling_timesteps=8,
            loss_type="l1", objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=0.0).eval()
        ours = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: jmodel.apply(p, x, t, pc),
            image_size=16, timesteps=100, sampling_timesteps=8,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=0.0)

        x0 = rng.uniform(-1, 1, size=(2, 16, 16, 1)).astype(np.float32)
        noise = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
        t = np.array([3, 77], np.int64)
        pc = np.array([[585.0, 585.0, 128.0, 128.0]] * 2, np.float32)

        with torch.no_grad():
            ref_loss = rdiff.p_losses(
                torch.tensor(x0).permute(0, 3, 1, 2), torch.tensor(t),
                torch.tensor(pc),
                noise=torch.tensor(noise).permute(0, 3, 1, 2))
        loss = ours.p_losses(ported, jax.random.PRNGKey(0), jnp.asarray(x0),
                             jnp.asarray(t), jnp.asarray(pc),
                             noise=jnp.asarray(noise))
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=5e-5,
                                   rtol=1e-4)
