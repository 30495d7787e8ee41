"""Tiled x mesh on real silicon vs jit HOST-STITCH tiled (the pinned
contract, tests/test_tiled.py::test_tiled_sharded_matches_jit_host_stitch)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from fft_restoration_tpu.utils.imageio import imread
from fft_restoration_tpu.models.tiled import tiled_restore_image
from fft_restoration_tpu.parallel.mesh import make_mesh2d
from fft_restoration_tpu.utils.devwatch import arm

done = arm(2400, {"what": "tile_mesh_ab2"})
img = imread("/root/reference/input/cat_blurred.png")[..., ::-1]
kw = dict(tile=512, fft_backend="pallas", white_balance=True)

t0 = time.perf_counter()
host_jit = tiled_restore_image(img, 60, 30.0, device_stitch=False, **kw)
print(f"jit host-stitch first call {time.perf_counter()-t0:.1f} s", flush=True)

t0 = time.perf_counter()
mesh_out = tiled_restore_image(img, 60, 30.0, mesh=make_mesh2d(1, 1), **kw)
print(f"tiled x (1,1)-mesh first call {time.perf_counter()-t0:.1f} s", flush=True)

d = np.abs(host_jit.astype(int) - mesh_out.astype(int))
print("mesh vs jit-host-stitch uint8 max diff:", d.max(),
      "nonzero:", int((d > 0).sum()), flush=True)

# also record the (documented) device-stitch semantic delta on silicon
dev_jit = tiled_restore_image(img, 60, 30.0, device_stitch=True, **kw)
d2 = np.abs(dev_jit.astype(int) - host_jit.astype(int))
print("device-stitch vs host-stitch jit delta:", d2.max(),
      "nonzero:", int((d2 > 0).sum()), flush=True)

for name, fn in [("mesh", lambda: tiled_restore_image(img, 60, 30.0, mesh=make_mesh2d(1,1), **kw)),
                 ("jit-host", lambda: tiled_restore_image(img, 60, 30.0, device_stitch=False, **kw)),
                 ("jit-dev", lambda: tiled_restore_image(img, 60, 30.0, **kw))]:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    print(f"{name} warm best {min(ts)*1e3:.1f} ms", flush=True)
done.set()
print("AB2_DONE", flush=True)
