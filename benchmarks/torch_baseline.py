"""PyTorch-CPU baseline for bench.py.

The reference publishes no FPS numbers (BASELINE.md) and its exact scripts
need torchvision + CUDA + datasets that are absent here, so the baseline is
an independent PyTorch implementation of the SAME end-to-end fusion
workload (tiny-YOLOv3 backbone + decode + class-aware NMS + 490-ch score
map + PS-RoIAlign/RoIAlign on 200+32 proposals + refinement/ensemble
heads — the run_mp.py consumer graph, SURVEY.md §3.1/§3.3), written with
plain torch ops (no torchvision). This measures what the reference's
torch stack achieves per frame on this host's CPU; the TPU number is
compared against it.
"""
from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _cbl(cin, cout, k=3, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, k // 2, bias=False),
        nn.BatchNorm2d(cout),
        nn.LeakyReLU(0.1),
    )


class TinyYoloTorch(nn.Module):
    """tiny-YOLOv3 topology (13 convs, 6 maxpools, route/upsample)."""

    def __init__(self, num_classes=12):
        super().__init__()
        self.c1 = _cbl(3, 16)
        self.c2 = _cbl(16, 32)
        self.c3 = _cbl(32, 64)
        self.c4 = _cbl(64, 128)
        self.c5 = _cbl(128, 256)       # feature tap (stride 16)
        self.c6 = _cbl(256, 512)
        self.c7 = _cbl(512, 1024)
        self.c8 = _cbl(1024, 256, k=1)
        self.c9 = _cbl(256, 512)
        self.det1 = nn.Conv2d(512, 3 * (5 + num_classes), 1)
        self.c10 = _cbl(256, 128, k=1)
        self.c11 = _cbl(384, 256)
        self.det2 = nn.Conv2d(256, 3 * (5 + num_classes), 1)
        self.num_classes = num_classes

    def forward(self, x):
        x = F.max_pool2d(self.c1(x), 2, 2)
        x = F.max_pool2d(self.c2(x), 2, 2)
        x = F.max_pool2d(self.c3(x), 2, 2)
        x = F.max_pool2d(self.c4(x), 2, 2)
        tap = self.c5(x)
        x = F.max_pool2d(tap, 2, 2)
        x = F.max_pool2d(F.pad(self.c6(x), (0, 1, 0, 1)), 2, 1)
        x = self.c7(x)
        r8 = self.c8(x)
        d1 = self.det1(self.c9(r8))
        u = F.interpolate(self.c10(r8), scale_factor=2, mode="nearest")
        d2 = self.det2(self.c11(torch.cat([u, tap], 1)))
        return tap, d1, d2


def decode(raw, anchors, num_classes, img_dim):
    n, _, g, _ = raw.shape
    a = len(anchors)
    f = 5 + num_classes
    p = raw.view(n, a, f, g, g).permute(0, 1, 3, 4, 2)
    grid = torch.arange(g, dtype=torch.float32)
    gy, gx = torch.meshgrid(grid, grid, indexing="ij")
    stride = img_dim / g
    anc = torch.tensor(anchors, dtype=torch.float32)
    xy = (torch.sigmoid(p[..., :2])
          + torch.stack([gx, gy], -1)) * stride
    wh = torch.exp(p[..., 2:4]) * anc[None, :, None, None]
    conf = torch.sigmoid(p[..., 4:5])
    cls = torch.sigmoid(p[..., 5:])
    return torch.cat([xy, wh, conf, cls], -1).reshape(n, -1, f)


def nms_greedy(boxes, scores, iou_thresh=0.5):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel():
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        b = boxes[i]
        rest = boxes[order[1:]]
        ix1 = torch.maximum(b[0], rest[:, 0])
        iy1 = torch.maximum(b[1], rest[:, 1])
        ix2 = torch.minimum(b[2], rest[:, 2])
        iy2 = torch.minimum(b[3], rest[:, 3])
        inter = (ix2 - ix1).clamp(min=0) * (iy2 - iy1).clamp(min=0)
        a1 = (b[2] - b[0]) * (b[3] - b[1])
        a2 = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-16)
        order = order[1:][iou <= iou_thresh]
    return torch.tensor(keep, dtype=torch.long)


def roi_align_torch(feat, rois, out=7, scale=1.0 / 16):
    """Vectorized torch RoIAlign via grid_sample (one batched bilinear
    gather for all rois — the FAIR way to write this workload in torch;
    a per-roi python loop would understate the baseline)."""
    n, c, h, w = feat.shape
    k = len(rois)
    if k == 0:
        return feat.new_zeros(0, c, out, out)
    b = rois[:, 0].long()
    x1 = rois[:, 1] * scale
    y1 = rois[:, 2] * scale
    rw = (rois[:, 3] * scale - x1).clamp(min=1.0)
    rh = (rois[:, 4] * scale - y1).clamp(min=1.0)
    # bin-center sample positions, 1 tap per bin
    steps = (torch.arange(out, dtype=torch.float32) + 0.5) / out
    ys = y1[:, None] + rh[:, None] * steps[None, :]          # [k, out]
    xs = x1[:, None] + rw[:, None] * steps[None, :]
    # normalize to [-1, 1] for grid_sample (align_corners=False)
    gy = ys * 2 / h - 1
    gx = xs * 2 / w - 1
    grid = torch.stack([gx[:, None, :].expand(k, out, out),
                        gy[:, :, None].expand(k, out, out)], -1)
    return F.grid_sample(feat[b], grid, mode="bilinear",
                          align_corners=False, padding_mode="border")


class FusionTorch(nn.Module):
    def __init__(self, num_classes=12):
        super().__init__()
        self.backbone = TinyYoloTorch(num_classes)
        self.img_cnn = nn.Sequential(
            nn.Conv2d(256, 490, 1), nn.BatchNorm2d(490), nn.LeakyReLU(0.1))
        self.radar_enc = nn.Sequential(
            _cbl(3, 32), _cbl(32, 64), _cbl(64, 128),
            nn.Conv2d(128, 10, 1), nn.Sigmoid())
        self.net0 = nn.Linear(490, 256)
        self.net1 = nn.Linear(256, 4)
        self.net2 = nn.Linear(256, 13)
        self.radar_net = nn.Sequential(
            nn.Conv2d(10, 10, 7), nn.BatchNorm2d(10), nn.LeakyReLU(0.1),
            nn.Conv2d(10, 1, 1))
        self.fc1 = nn.Linear(2, 32)
        self.fc2 = nn.Linear(32 * 2, 2)

    @torch.no_grad()
    def forward(self, img, radar_map, radar_boxes, conf_thresh=0.2):
        anchors1 = ((81, 82), (135, 169), (344, 319))
        anchors2 = ((10, 14), (23, 27), (37, 58))
        tap, d1, d2 = self.backbone(img)
        det = torch.cat([
            decode(d1, anchors1, 12, img.shape[-1]),
            decode(d2, anchors2, 12, img.shape[-1])], 1)[0]
        m = det[:, 4] > conf_thresh
        det = det[m]
        xyxy = torch.stack([
            det[:, 0] - det[:, 2] / 2, det[:, 1] - det[:, 3] / 2,
            det[:, 0] + det[:, 2] / 2, det[:, 1] + det[:, 3] / 2], -1)
        cls = det[:, 5:].argmax(-1)
        keep = nms_greedy(xyxy + cls[:, None].float() * 4096, det[:, 4])
        keep = keep[:200]
        boxes = xyxy[keep]

        score_map = self.img_cnn(tap)
        radar_map = self.radar_enc(radar_map)
        rois = torch.cat([torch.zeros(len(boxes), 1), boxes], 1)
        rrois = torch.cat([torch.zeros(len(radar_boxes), 1),
                           radar_boxes], 1)
        all_rois = torch.cat([rois, rrois])
        img_crop = roi_align_torch(score_map, all_rois)          # [K,490,7,7]
        # PS pooling: bin (i,j) reads channels [(i*7+j)*10:(i*7+j+1)*10]
        k = img_crop.shape[0]
        ps = img_crop.view(k, 49, 10, 7, 7)
        idx = torch.arange(49)
        ps = ps[:, idx, :, idx // 7, idx % 7].permute(1, 2, 0).reshape(k, -1)
        radar_crop = roi_align_torch(radar_map, all_rois)
        t = F.leaky_relu(self.net0(ps), 0.1)
        reg = self.net1(t)
        vec = torch.sigmoid(self.net2(t))
        rconf = torch.sigmoid(self.radar_net(radar_crop).view(k, 1))
        conf = torch.sigmoid(rconf + vec[:, :1])
        stack = torch.stack([torch.cat([conf, vec[:, 1:2]], 1),
                             torch.cat([conf, vec[:, 1:2]], 1)], -1)
        e = F.leaky_relu(self.fc1(stack), 0.1).reshape(k, -1)
        masks = torch.softmax(self.fc2(e), -1)
        return reg, masks


def measure_torch_fps(img_size=416, iters=20, warmup=3):
    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = FusionTorch().eval()
    img = torch.rand(1, 3, img_size, img_size)
    rmap = torch.rand(1, 3, img_size // 16, img_size // 16)
    rboxes = torch.rand(8, 2) * 100
    rboxes = torch.cat([rboxes, rboxes + 60], 1)
    for _ in range(warmup):
        model(img, rmap, rboxes)
    t0 = time.perf_counter()
    for _ in range(iters):
        model(img, rmap, rboxes)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


if __name__ == "__main__":
    print(measure_torch_fps())
