"""PNDM/PLMS sampler tests.

Golden: a stateful numpy mirror of diffusers-0.13 PNDMScheduler.step_plms
(skip_prk_steps=true — the exact operating point of the reference's
SD-1.5 checkpoint: ckpt/stable-diffusion-v1-5/scheduler/
scheduler_config.json `_class_name: PNDMScheduler`). diffusers itself is
not installed in this sandbox, so the mirror re-implements its update
math line-for-line (ets list, counter, cur_sample, timestep juggling) and
the jittable ring-buffer implementation must match it to fp32 roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import pndm as P
from storygen_tpu.diffusion import schedule as S


class _DiffusersPLMSMirror:
    """Numpy mirror of PNDMScheduler (skip_prk_steps=True) semantics."""

    def __init__(self, cfg: SchedulerConfig, num_inference_steps: int):
        betas = (np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                             cfg.num_train_timesteps) ** 2)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = (1.0 if cfg.set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * self.ratio
              ).round().astype(np.int64) + cfg.steps_offset
        # skip_prk_steps=True: prk list empty, plms visits ts[-2] twice
        self.timesteps = np.concatenate(
            [ts[:-1], ts[-2:-1], ts[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, timestep, sample):
        prev_timestep = timestep - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + self.ratio

        if len(self.ets) == 1 and self.counter == 0:
            model_output = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            model_output = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            model_output = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            model_output = (23 * self.ets[-1] - 16 * self.ets[-2]
                            + 5 * self.ets[-3]) / 12
        else:
            model_output = (1 / 24) * (55 * self.ets[-1] - 59 * self.ets[-2]
                                       + 37 * self.ets[-3]
                                       - 9 * self.ets[-4])
        prev = self._get_prev_sample(sample, timestep, prev_timestep,
                                     model_output)
        self.counter += 1
        return prev

    def _get_prev_sample(self, sample, timestep, prev_timestep,
                         model_output):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0
                             else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
        denom = (alpha_prod_t * beta_prod_t_prev ** 0.5
                 + (alpha_prod_t * beta_prod_t * alpha_prod_t_prev) ** 0.5)
        return (sample_coeff * sample
                - (alpha_prod_t_prev - alpha_prod_t) * model_output / denom)


def test_plms_timestep_arrays():
    cfg = SchedulerConfig()
    t_eval, t_cf, prev_cf = P.plms_timesteps(cfg, 10)
    mirror = _DiffusersPLMSMirror(cfg, 10)
    np.testing.assert_array_equal(t_eval, mirror.timesteps)
    assert len(t_eval) == 11  # n+1: second timestep visited twice
    assert t_eval[1] == t_eval[2]
    # counter==1 juggling folded in statically
    assert prev_cf[1] == t_eval[1] and t_cf[1] == t_eval[1] + 100
    # all other steps: coeff t == eval t, prev == t - ratio
    mask = np.arange(len(t_eval)) != 1
    np.testing.assert_array_equal(t_cf[mask], t_eval[mask])
    np.testing.assert_array_equal(prev_cf[mask], t_eval[mask] - 100)


def test_plms_matches_diffusers_mirror():
    """Full 8-step trajectory with step-dependent pseudo model outputs."""
    cfg = SchedulerConfig()
    sched = S.make_schedule(cfg)
    n = 8
    t_eval, t_cf, prev_cf = P.plms_timesteps(cfg, n)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps_seq = [rng.randn(1, 4, 4, 4).astype(np.float32)
               for _ in range(len(t_eval))]

    mirror = _DiffusersPLMSMirror(cfg, n)
    xm = np.float64(1.0) * x
    for i, t in enumerate(mirror.timesteps):
        xm = mirror.step(eps_seq[i].astype(np.float64), int(t), xm)

    xj = jnp.asarray(x)
    state = P.init_state(xj)
    for i in range(len(t_eval)):
        xj, state = P.plms_step(sched, jnp.asarray(eps_seq[i]),
                                jnp.asarray(i), jnp.asarray(int(t_cf[i])),
                                jnp.asarray(int(prev_cf[i])), xj, state)
    np.testing.assert_allclose(np.asarray(xj), xm, rtol=2e-4, atol=2e-4)


def test_plms_matches_mirror_under_fori_loop():
    """Same trajectory jitted as one lax.fori_loop (the pipeline shape)."""
    cfg = SchedulerConfig()
    sched = S.make_schedule(cfg)
    n = 6
    t_eval, t_cf, prev_cf = P.plms_timesteps(cfg, n)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 2).astype(np.float32)
    eps_seq = np.stack([rng.randn(2, 4, 4, 2).astype(np.float32)
                        for _ in range(len(t_eval))])

    mirror = _DiffusersPLMSMirror(cfg, n)
    xm = np.float64(1.0) * x
    for i, t in enumerate(mirror.timesteps):
        xm = mirror.step(eps_seq[i].astype(np.float64), int(t), xm)

    tc = jnp.asarray(t_cf, jnp.int32)
    pc = jnp.asarray(prev_cf, jnp.int32)
    es = jnp.asarray(eps_seq)

    @jax.jit
    def run(x0):
        def body(i, carry):
            xx, st = carry
            xx, st = P.plms_step(sched, es[i], i, tc[i], pc[i], xx, st)
            return (xx, st)
        return jax.lax.fori_loop(0, len(t_eval), body,
                                 (x0, P.init_state(x0)))[0]

    np.testing.assert_allclose(np.asarray(run(jnp.asarray(x))), xm,
                               rtol=2e-4, atol=2e-4)


def test_plms_oracle_constant_eps():
    """The PNDM transfer formula preserves x = sqrt(acp) x0 +
    sqrt(1-acp) eps trajectories exactly: with a constant oracle eps every
    multistep average equals eps and the loop lands on the
    final_alpha_cumprod point of the trajectory."""
    cfg = SchedulerConfig()
    sched = S.make_schedule(cfg)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) * 0.5
    eps = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    t_eval, t_cf, prev_cf = P.plms_timesteps(cfg, 10)
    x = S.add_noise(sched, x0, eps, jnp.asarray(int(t_eval[0])))
    state = P.init_state(x)
    for i in range(len(t_eval)):
        x, state = P.plms_step(sched, eps, jnp.asarray(i),
                               jnp.asarray(int(t_cf[i])),
                               jnp.asarray(int(prev_cf[i])), x, state)
    facp = float(sched.final_alpha_cumprod)
    want = np.sqrt(facp) * np.asarray(x0) + np.sqrt(1 - facp) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-4, atol=1e-4)
