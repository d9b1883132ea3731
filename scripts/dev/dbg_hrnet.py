import sys
sys.path.insert(0, "/root/repo/tests"); sys.path.insert(0, "/root/repo")
import ref_stubs; ref_stubs.install()
sys.path.insert(0, "/root/reference")
import numpy as np, torch
print("imports ok", flush=True)
torch.manual_seed(7)
from isegm.model.is_hrnet_model import HRNetModel
ref = HRNetModel(width=18, ocr_width=64, small=True, with_aux_output=True,
                 use_rgb_conv=True, use_leaky_relu=True,
                 use_disks=True, norm_radius=5, with_prev_mask=True).eval()
print("ref built", flush=True)
with torch.no_grad():
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1); m.running_var.uniform_(0.5, 1.5)
            m.weight.normal_(1.0, 0.1); m.bias.normal_(0, 0.1)

rng = np.random.default_rng(8)
image = torch.from_numpy(rng.uniform(0, 1, (1, 4, 128, 128)).astype(np.float32))
pts = np.full((1, 8, 3), -1, np.float32)
pts[0, 0] = (40, 70, 0); pts[0, 4] = (100, 20, 1)
points = torch.from_numpy(pts)

with torch.no_grad():
    rgb, prev = ref.prepare_input(image)
    coords = ref.get_coord_features(rgb, prev, points)
    extra = ref.maps_transform(coords)
    fx = ref.feature_extractor
    x = fx.relu(fx.bn1(fx.conv1(rgb)))
    x = x + extra
    x = fx.relu(fx.bn2(fx.conv2(x)))
    x1 = fx.layer1(x)
print("ref intermediates ok", flush=True)

import jax.numpy as jnp
from pvpuformer_tpu.models.zoo.hrnet import HRNetISConfig, _bottleneck
from pvpuformer_tpu.models.zoo.common import is_inputs, maps_transform, conv_bn_relu
from pvpuformer_tpu.utils.torch_ingest import convert_hrnet_checkpoint
cfg = HRNetISConfig(width=18, small=True, ocr_width=64)
params = convert_hrnet_checkpoint({k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
jimg = jnp.asarray(image.numpy().transpose(0, 2, 3, 1))
jrgb, jcoords = is_inputs(jimg, jnp.asarray(pts), cfg.norm_radius, cfg.use_disks, cfg.with_prev_mask, cfg.dtype)
print("rgb", np.abs(np.asarray(jrgb).transpose(0,3,1,2) - rgb.numpy()).max(), flush=True)
print("coords", np.abs(np.asarray(jcoords).transpose(0,3,1,2) - coords.numpy()).max(), flush=True)
jextra = maps_transform(params["maps_transform"], jcoords, leaky=cfg.use_leaky_relu)
print("extra", np.abs(np.asarray(jextra).transpose(0,3,1,2) - extra.numpy()).max(), flush=True)
jx = conv_bn_relu(params["stem1"], jrgb, stride=2)
jx = jx + jextra
jx = conv_bn_relu(params["stem2"], jx, stride=2)
print("stem", np.abs(np.asarray(jx).transpose(0,3,1,2) - x.numpy()).max(), flush=True)
for blk in params["layer1"]:
    jx = _bottleneck(blk, jx)
print("layer1", np.abs(np.asarray(jx).transpose(0,3,1,2) - x1.numpy()).max(), flush=True)

d = np.abs(np.asarray(jextra).transpose(0,3,1,2) - extra.numpy())[0].max(0)
print("extra diff interior", d[2:-2, 2:-2].max(), "border", max(d[0].max(), d[-1].max(), d[:,0].max(), d[:,-1].max()), flush=True)
rel = d / (np.abs(extra.numpy()[0]).max(0) + 1e-8)
print("extra rel", np.median(rel), rel.max(), flush=True)
# oracle conv via torch on OUR padded input to isolate conv numerics
with torch.no_grad():
    tx = torch.from_numpy(np.asarray(jcoords).transpose(0,3,1,2))
    o1 = ref.maps_transform[0](tx)
    o1j = nn_conv1 = None
import pvpuformer_tpu.nn as pnn
j1 = pnn.conv1x1(params["maps_transform"]["conv1"], jcoords)
print("conv1 diff", np.abs(np.asarray(j1).transpose(0,3,1,2) - o1.numpy()).max(), flush=True)
import jax
j1l = jax.nn.leaky_relu(j1, 0.2)
with torch.no_grad():
    o2 = ref.maps_transform[1](o1)
print("leaky diff", np.abs(np.asarray(j1l).transpose(0,3,1,2) - o2.numpy()).max(), flush=True)
j2 = pnn.conv2d(params["maps_transform"]["conv2"], j1l, stride=2)
with torch.no_grad():
    o3 = ref.maps_transform[2](o2)
print("conv2 diff", np.abs(np.asarray(j2).transpose(0,3,1,2) - o3.numpy()).max(), flush=True)

w_t = ref.maps_transform[0].weight.detach().numpy()   # (16,3,1,1)
b_t = ref.maps_transform[0].bias.detach().numpy()
cnp = np.asarray(jcoords)[0]                           # (H,W,3)
o_np = cnp.reshape(-1,3) @ w_t[:, :, 0, 0].T + b_t     # numpy oracle
print("numpy-vs-torch", np.abs(o_np.reshape(128,128,16).transpose(2,0,1) - o1.numpy()[0]).max(), flush=True)
wj = params["maps_transform"]["conv1"]["w"].reshape(3,16)
print("w match", np.abs(wj - w_t[:, :, 0, 0].T).max(), flush=True)
print("numpy-vs-jax", np.abs(o_np.reshape(128,128,16) - np.asarray(j1)[0]).max(), flush=True)
import jax.numpy as jnp2
xx = jnp2.asarray(cnp.reshape(-1,3))
yy = np.asarray(jnp2.dot(xx, jnp2.asarray(wj)))
print("plain jnp.dot vs numpy", np.abs(yy + b_t - o_np).max(), flush=True)
