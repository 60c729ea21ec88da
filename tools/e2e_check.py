"""Manual e2e harness: encode -> self-decode -> oracle decode -> compare."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import psnr, synthetic_frames

W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (64, 48)
QP = int(sys.argv[3]) if len(sys.argv) > 3 else 32

cfg = StreamConfig(width=W, height=H, qp=QP)
enc = Encoder(cfg)
frames = synthetic_frames(W, H, 1, seed=3)
y, u, v = frames[0]
stream, recon = enc.encode_frame(y, u, v)
open("/tmp/e2e.265", "wb").write(stream)
print(f"encoded {len(stream)} bytes; recon PSNR-Y {psnr(y, recon[0]):.2f} dB")

dec = Decoder()
outs = dec.decode(stream)
assert len(outs) == 1, f"self-decode produced {len(outs)} frames"
for name, a, b in zip("YUV", recon, outs[0]):
    if not np.array_equal(a, b):
        print(f"SELF-DECODE MISMATCH plane {name}: {np.sum(a != b)} samples differ")
        idx = np.argwhere(a.astype(int) != b.astype(int))[:5]
        print(idx)
        sys.exit(1)
print("self-decode: bit-exact")

r = subprocess.run(
    ["tools/hevcref", "decode", "/tmp/e2e.265", "/tmp/e2e_ref.yuv"],
    capture_output=True,
    text=True,
)
print("oracle stderr:", r.stderr.strip()[-500:])
ref = open("/tmp/e2e_ref.yuv", "rb").read()
need = W * H * 3 // 2
if len(ref) < need:
    print(f"ORACLE FAILED to decode: got {len(ref)} bytes, need {need}")
    sys.exit(2)
refy = np.frombuffer(ref[: W * H], dtype=np.uint8).reshape(H, W)
refu = np.frombuffer(ref[W * H : W * H + W * H // 4], dtype=np.uint8).reshape(H // 2, W // 2)
refv = np.frombuffer(ref[W * H + W * H // 4 : need], dtype=np.uint8).reshape(H // 2, W // 2)
ok = True
for name, mine, theirs in zip("YUV", recon, (refy, refu, refv)):
    if np.array_equal(mine, theirs):
        print(f"oracle {name}: bit-exact")
    else:
        ok = False
        d = np.argwhere(mine.astype(int) != theirs.astype(int))
        print(f"ORACLE MISMATCH {name}: {len(d)} samples, first {d[:5].tolist()}")
        yy, xx = d[0]
        print("  mine:", mine[max(0,yy-1):yy+2, max(0,xx-1):xx+3])
        print("  ref :", theirs[max(0,yy-1):yy+2, max(0,xx-1):xx+3])
sys.exit(0 if ok else 3)
