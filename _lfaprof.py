import time, jax, numpy as np, jax.numpy as jnp
import flax.linen as nn
from myria3d_tpu.models.modules.randla_net import LocalFeatureAggregation, DilatedResidualBlock
from myria3d_tpu.ops.knn import knn_graph, gather_neighbors
from myria3d_tpu.ops.masked import masked_softmax

B, N, K = 16, 12288, 16
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.uniform(-1,1,(B,N,3)).astype(np.float32))
mask = jnp.ones((B,N), bool)
x4 = jnp.asarray(rng.normal(size=(B,N,4)).astype(np.float32))

idx, d2, nv = knn_graph(pos, mask, K)
idx = jax.device_get(idx); nv_ = jax.device_get(nv)
idx = jnp.asarray(idx); nv = jnp.asarray(nv_)

def bench(f, args, name, iters=6):
    r = jax.device_get(f(*args))
    t0=time.perf_counter()
    for _ in range(iters): r = jax.device_get(f(*args))
    print(name, round((time.perf_counter()-t0)/iters*1e3,1), "ms")

# 1. gathers only
g1 = jax.jit(lambda p,x,i: (gather_neighbors(p,i).sum() + gather_neighbors(x,i).sum()))
bench(g1, (pos,x4,idx), "gathers pos_j + x_j")

# 2. LocSE rel_infos compute (given pos_j)
def locse(p, i):
    pj = gather_neighbors(p, i)
    pi = jnp.broadcast_to(p[:, :, None, :], pj.shape)
    diff = pj - pi
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff*diff,-1,keepdims=True),0))
    return jnp.concatenate([pi,pj,diff,dist],-1).sum()
bench(jax.jit(locse), (pos,idx), "locse concat")

# 3. dense 10->4 on (B,N,K,10)
dense = nn.Dense(4)
dv = dense.init(jax.random.PRNGKey(0), jnp.zeros((1,10)))
relz = jnp.asarray(rng.normal(size=(B,N,K,10)).astype(np.float32))
bench(jax.jit(lambda v,r: dense.apply(v,r).sum()), (dv,relz), "Dense 10->4 on (B,N,K,10)")

# 4. masked softmax over K on (B,N,K,8)
att = jnp.asarray(rng.normal(size=(B,N,K,8)).astype(np.float32))
bench(jax.jit(lambda a,v: masked_softmax(a, v[...,None], axis=2).sum()), (att,nv), "masked_softmax K")

# 5. masked BN on (B,N,K,8) edges
from myria3d_tpu.models.modules.nn import MaskedBatchNorm
bn = MaskedBatchNorm(8)
bnv = bn.init(jax.random.PRNGKey(0), att, nv, False)
bench(jax.jit(lambda v,a,m: bn.apply(v,a,m,False).sum()), (bnv,att,nv), "masked BN eval (B,N,K,8)")
bench(jax.jit(lambda v,a,m: bn.apply(v,a,m,True,mutable=['batch_stats'])[0].sum()), (bnv,att,nv), "masked BN train (B,N,K,8)")
