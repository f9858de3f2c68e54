// Software triangle rasterizer (flat-shaded, z-buffered) for the
// visualization pipeline — native replacement for the reference's
// EGL/pyrender offscreen renderer (diffphys/pyrender_wrapper.py), which is
// not available in this environment. Built as a shared library and driven
// from Python via ctypes (see ppr_diffphys_tpu/utils/render.py).
//
// Inputs are camera-space vertices; perspective projection and shading
// happen here so the Python side only does geometry setup.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// verts_cam: (V,3) float32 camera-space (x right, y down, z forward)
// faces: (F,3) int32
// colors: (V,3) uint8 per-vertex albedo
// K: fx, fy, px, py
// light_dir: (3,) normalized, camera space
// out_img: (H,W,3) uint8 (pre-filled with background)
// shadow: if nonzero, draw a fake y=floor_y shadow pass first (ignored here;
//         shadows handled by a darkened floor-projected pass from Python)
void rasterize(
    const float* verts_cam, int64_t n_verts,
    const int32_t* faces, int64_t n_faces,
    const uint8_t* colors,
    const float* K,
    const float* light_dir,
    int32_t H, int32_t W,
    uint8_t* out_img)
{
    const float fx = K[0], fy = K[1], px = K[2], py = K[3];
    const float znear = 1e-3f;

    std::vector<float> zbuf((size_t)H * W, 1e30f);

    // project all vertices
    std::vector<float> sx(n_verts), sy(n_verts), sz(n_verts);
    for (int64_t i = 0; i < n_verts; ++i) {
        float x = verts_cam[3 * i + 0];
        float y = verts_cam[3 * i + 1];
        float z = verts_cam[3 * i + 2];
        sz[i] = z;
        if (z < znear) { sx[i] = -1e9f; sy[i] = -1e9f; continue; }
        sx[i] = fx * x / z + px;
        sy[i] = fy * y / z + py;
    }

    for (int64_t f = 0; f < n_faces; ++f) {
        int32_t i0 = faces[3 * f + 0];
        int32_t i1 = faces[3 * f + 1];
        int32_t i2 = faces[3 * f + 2];
        float z0 = sz[i0], z1 = sz[i1], z2 = sz[i2];
        if (z0 < znear || z1 < znear || z2 < znear) continue;

        float x0 = sx[i0], y0 = sy[i0];
        float x1 = sx[i1], y1 = sy[i1];
        float x2 = sx[i2], y2 = sy[i2];

        int minx = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
        int maxx = std::min(W - 1, (int)std::ceil(std::max({x0, x1, x2})));
        int miny = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
        int maxy = std::min(H - 1, (int)std::ceil(std::max({y0, y1, y2})));
        if (minx > maxx || miny > maxy) continue;

        float denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2);
        if (std::fabs(denom) < 1e-12f) continue;
        float inv_denom = 1.0f / denom;

        // face normal in camera space for flat shading
        float ax = verts_cam[3*i1+0] - verts_cam[3*i0+0];
        float ay = verts_cam[3*i1+1] - verts_cam[3*i0+1];
        float az = verts_cam[3*i1+2] - verts_cam[3*i0+2];
        float bx = verts_cam[3*i2+0] - verts_cam[3*i0+0];
        float by = verts_cam[3*i2+1] - verts_cam[3*i0+1];
        float bz = verts_cam[3*i2+2] - verts_cam[3*i0+2];
        float nx = ay * bz - az * by;
        float ny = az * bx - ax * bz;
        float nz = ax * by - ay * bx;
        float nl = std::sqrt(nx * nx + ny * ny + nz * nz);
        float shade = 0.55f;
        if (nl > 1e-12f) {
            float d = (nx * light_dir[0] + ny * light_dir[1] + nz * light_dir[2]) / nl;
            shade = 0.45f + 0.55f * std::fabs(d);
        }

        for (int yy = miny; yy <= maxy; ++yy) {
            for (int xx = minx; xx <= maxx; ++xx) {
                float w0 = ((y1 - y2) * (xx - x2) + (x2 - x1) * (yy - y2)) * inv_denom;
                float w1 = ((y2 - y0) * (xx - x2) + (x0 - x2) * (yy - y2)) * inv_denom;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                // perspective-correct depth
                float z = 1.0f / (w0 / z0 + w1 / z1 + w2 / z2);
                size_t idx = (size_t)yy * W + xx;
                if (z >= zbuf[idx]) continue;
                zbuf[idx] = z;
                for (int c = 0; c < 3; ++c) {
                    float col = w0 * colors[3 * i0 + c] + w1 * colors[3 * i1 + c]
                              + w2 * colors[3 * i2 + c];
                    float v = col * shade;
                    out_img[3 * idx + c] = (uint8_t)std::min(255.0f, std::max(0.0f, v));
                }
            }
        }
    }
}

}  // extern "C"
