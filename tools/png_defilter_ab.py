"""A/B: old per-byte Python PNG defilter vs vectorized one (r11)."""
import random, sys, time
sys.path.insert(0, "/root/repo")
from aws_dataset_ingestion_metrics_collection_framework_spark.operators.multimodal import _png_unfilter

def old_unfilter(raw, width, height, bpp):
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]; pos += 1
        line = bytearray(raw[pos:pos+stride]); pos += stride
        off = y * stride; prev_off = off - stride
        if ftype == 0: pass
        elif ftype == 1:
            for i in range(bpp, stride): line[i] = (line[i] + line[i-bpp]) & 0xFF
        elif ftype == 2:
            if y > 0:
                for i in range(stride): line[i] = (line[i] + out[prev_off+i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i-bpp] if i >= bpp else 0
                b = out[prev_off+i] if y > 0 else 0
                line[i] = (line[i] + ((a+b) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i-bpp] if i >= bpp else 0
                b = out[prev_off+i] if y > 0 else 0
                c = out[prev_off+i-bpp] if (y > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p-a), abs(p-b), abs(p-c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else: raise ValueError(ftype)
        out[off:off+stride] = line
    return bytes(out)

def forward_filter(img_rows, ftypes, bpp):
    """Apply PNG forward filtering so unfiltering reconstructs img_rows."""
    stride = len(img_rows[0]); raw = bytearray()
    for y, ft in enumerate(ftypes):
        cur = img_rows[y]; prev = img_rows[y-1] if y else bytes(stride)
        raw.append(ft); enc = bytearray(stride)
        for i in range(stride):
            x = cur[i]
            a = cur[i-bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i-bpp] if i >= bpp else 0
            if ft == 0: enc[i] = x
            elif ft == 1: enc[i] = (x - a) & 0xFF
            elif ft == 2: enc[i] = (x - b) & 0xFF
            elif ft == 3: enc[i] = (x - ((a+b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p-a), abs(p-b), abs(p-c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (x - pred) & 0xFF
        raw += enc
    return bytes(raw)

random.seed(11)
W = H = 256; BPP = 3
img = [bytes(random.randrange(256) for _ in range(W*BPP)) for _ in range(H)]
flat = b"".join(img)

cases = {
    "all_none(0)": [0]*H,
    "all_sub(1)": [1]*H,
    "all_up(2)": [2]*H,
    "all_avg(3)": [3]*H,
    "all_paeth(4)": [4]*H,
    "libpng_mix": [random.choice([0,1,2,2,2,4]) for _ in range(H)],
    "cycle": [y % 5 for y in range(H)],
}
print(f"image {W}x{H} rgb8 ({W*H*BPP/1e6:.2f} MB decoded)")
for name, fts in cases.items():
    raw = forward_filter(img, fts, BPP)
    o = old_unfilter(raw, W, H, BPP)
    n = _png_unfilter(raw, W, H, BPP)
    assert o == flat == n, f"{name}: MISMATCH"
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps): old_unfilter(raw, W, H, BPP)
    t_old = (time.perf_counter()-t0)/reps
    t0 = time.perf_counter()
    for _ in range(reps): _png_unfilter(raw, W, H, BPP)
    t_new = (time.perf_counter()-t0)/reps
    print(f"{name:>14}: old {t_old*1e3:7.1f} ms  new {t_new*1e3:7.1f} ms  speedup {t_old/t_new:6.1f}x")
