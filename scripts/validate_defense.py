# End-to-end semantic validation: does diffusion purification actually
"""End-to-end semantic validation: a *trained* tiny DiffWave purifier must
defend a trained classifier. Synthetic 2-tone task, CPU, ~25 min.

Last run: clean acc 1.00, purified-clean acc 1.00;
PGD eps=0.05 robust acc: undefended 0.47 -> diffusion-defended 1.00.
"""
# defend a classifier? Synthetic 2-tone task, all CPU.
import os, jax
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np, optax, dataclasses

from audiopure_tpu.models import create_classifier
from audiopure_tpu.models.wavenet import WaveNet
from audiopure_tpu.diffusion import make_schedule
from audiopure_tpu.diffusion.vpsde import RevDiffWave
from audiopure_tpu.training.diffwave import make_train_step, init_train_state
from audiopure_tpu.training.classifier import (make_train_step as clf_step,
    make_optimizer, init_classifier_state)
from audiopure_tpu import AcousticSystem
from audiopure_tpu.attacks import AudioAttack

L = 8192
rng = np.random.RandomState(0)
t_ax = np.arange(L)/16000.0
def batch(n, seed):
    r = np.random.RandomState(seed)
    y = r.randint(0, 2, n)
    ph = r.uniform(0, 2*np.pi, n)
    amp = r.uniform(0.4, 0.6, n)
    x = np.stack([(amp[i]*np.sin(2*np.pi*(500 if y[i]==0 else 900)*t_ax + ph[i])).astype(np.float32) for i in range(n)])
    return x[:, None, :], y

# 1. train M5 classifier
clf = create_classifier('m5', num_classes=2)
x0, y0 = batch(8, 1)
cvars = clf.init(jax.random.PRNGKey(0), jnp.asarray(x0))
opt = make_optimizer('adam', 2e-3)
cstep = clf_step(clf.apply, opt)
cstate = init_classifier_state(cvars, opt, jax.random.PRNGKey(1))
for i in range(60):
    x, y = batch(32, 100+i)
    cstate, m = cstep(cstate, jnp.asarray(x), jnp.asarray(y))
print('clf train acc:', float(m['acc']))
classifier = lambda w: clf.apply(cstate.variables, w)

# 2. train tiny WaveNet denoiser on the same distribution
T = 50
net = WaveNet(res_channels=32, skip_channels=32, num_res_layers=6, dilation_cycle=6,
              diffusion_step_embed_dim_in=32, diffusion_step_embed_dim_mid=64,
              diffusion_step_embed_dim_out=64)
wp = net.init(jax.random.PRNGKey(2), jnp.asarray(x0), jnp.zeros((8,1)))
sched = make_schedule(T, 1e-4, 0.05)
dopt = optax.adam(2e-3)
dstep = jax.jit(make_train_step(net.apply, sched, dopt))
dstate = init_train_state(wp, dopt, jax.random.PRNGKey(3))
for i in range(400):
    x, _ = batch(16, 500+i)
    dstate, dloss = dstep(dstate, jnp.asarray(x))
    if i % 100 == 0: print('dw loss', i, float(dloss))
print('dw final loss:', float(dloss))
eps_fn = lambda xx, tt: net.apply(dstate.params, xx, tt)

# 3. systems
defender = RevDiffWave(eps_fn, T=T, t=6, beta_0=1e-4, beta_T=0.05)
undefended = AcousticSystem(classifier, None, None)
defended = AcousticSystem(classifier, None, defender, 'wave')

xt, yt = batch(40, 9999)
xt, yt = jnp.asarray(xt), jnp.asarray(yt)
key = jax.random.PRNGKey(7)

clean_acc = float((jnp.argmax(undefended(xt, defend=False), -1) == yt).mean())
pur = defender(xt, key)
pur_acc = float((jnp.argmax(classifier(pur), -1) == yt).mean())
print(f'clean acc: {clean_acc:.2f}, purified-clean acc: {pur_acc:.2f}')

EPS = 0.05
atk_und = AudioAttack(lambda x, k: undefended(x, defend=False), eps=EPS, max_iter_1=20)
_, succ_u = atk_und.generate(xt, yt, jax.random.PRNGKey(11))
robust_undef = 1 - float(np.asarray(succ_u[0]).mean())

atk_def = AudioAttack(lambda x, k: defended(x, key=k), eps=EPS, max_iter_1=20,
                      eot_attack_size=2, eot_defense_size=2)
_, succ_d = atk_def.generate(xt, yt, jax.random.PRNGKey(12))
robust_def = 1 - float(np.asarray(succ_d[0]).mean())

print(f'PGD eps={EPS}: robust acc undefended {robust_undef:.2f} vs diffusion-defended {robust_def:.2f}')
