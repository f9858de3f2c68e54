// Software triangle rasterizer (smooth-shaded, z-buffered) for the
// visualization pipeline — native replacement for the reference's
// EGL/pyrender offscreen renderer (diffphys/pyrender_wrapper.py), which is
// not available in this environment. Built as a shared library and driven
// from Python via ctypes (see ppr_diffphys_tpu/utils/render.py).
//
// Shading approximates the reference's pyrender setup — one white
// DirectionalLight (intensity 5, pyrender_wrapper.py:34) on a
// MetallicRoughnessMaterial (roughness=0.75, metallic=0.75,
// pyrender_wrapper.py:35-37) — with per-vertex (area-weighted) normals
// interpolated perspective-correctly per pixel, a Lambertian diffuse
// term, a Blinn-Phong specular lobe tinted toward the albedo (the
// metallic part), and a constant ambient floor. Normals are oriented
// toward the viewer per pixel (two-sided, so inconsistent winding in
// URDF collision meshes never renders black).
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
// light_dir: (3,) normalized travel direction of the light, camera space
//            (e.g. top-down light = (0,1,0) in CV convention, y down)
// out_img: (H,W,3) uint8 (pre-filled with background)
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

    // per-vertex normals: area-weighted face-normal accumulation (the
    // unnormalized cross product IS twice the face area), normalized per
    // vertex — the same smooth normals trimesh hands pyrender
    std::vector<float> vn((size_t)n_verts * 3, 0.0f);
    for (int64_t f = 0; f < n_faces; ++f) {
        int32_t i0 = faces[3 * f + 0];
        int32_t i1 = faces[3 * f + 1];
        int32_t i2 = faces[3 * f + 2];
        float ax = verts_cam[3*i1+0] - verts_cam[3*i0+0];
        float ay = verts_cam[3*i1+1] - verts_cam[3*i0+1];
        float az = verts_cam[3*i1+2] - verts_cam[3*i0+2];
        float bx = verts_cam[3*i2+0] - verts_cam[3*i0+0];
        float by = verts_cam[3*i2+1] - verts_cam[3*i0+1];
        float bz = verts_cam[3*i2+2] - verts_cam[3*i0+2];
        float nx = ay * bz - az * by;
        float ny = az * bx - ax * bz;
        float nz = ax * by - ay * bx;
        for (int32_t vi : {i0, i1, i2}) {
            vn[3 * vi + 0] += nx;
            vn[3 * vi + 1] += ny;
            vn[3 * vi + 2] += nz;
        }
    }
    for (int64_t i = 0; i < n_verts; ++i) {
        float nl = std::sqrt(vn[3*i]*vn[3*i] + vn[3*i+1]*vn[3*i+1]
                             + vn[3*i+2]*vn[3*i+2]);
        if (nl > 1e-12f) {
            vn[3*i] /= nl; vn[3*i+1] /= nl; vn[3*i+2] /= nl;
        }
    }

    // light vector FROM surface TO light
    const float lx = -light_dir[0], ly = -light_dir[1], lz = -light_dir[2];
    // shading constants approximating the reference material under a
    // unit-intensity directional light + ambient (tuned so the value
    // range matches the previous flat shader's 0.45..1.0 envelope)
    const float ambient = 0.40f;
    const float kd = 0.60f;           // diffuse weight (1 - metallic-ish)
    const float ks = 0.30f;           // specular weight
    const float metallic = 0.75f;     // spec tint toward albedo
    const float shininess = 8.0f;     // Blinn-Phong lobe for roughness=0.75

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
        const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;

        for (int yy = miny; yy <= maxy; ++yy) {
            for (int xx = minx; xx <= maxx; ++xx) {
                float w0 = ((y1 - y2) * (xx - x2) + (x2 - x1) * (yy - y2)) * inv_denom;
                float w1 = ((y2 - y0) * (xx - x2) + (x0 - x2) * (yy - y2)) * inv_denom;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                // perspective-correct interpolation weights
                float p0 = w0 * iz0, p1 = w1 * iz1, p2 = w2 * iz2;
                float z = 1.0f / (p0 + p1 + p2);
                size_t idx = (size_t)yy * W + xx;
                if (z >= zbuf[idx]) continue;
                zbuf[idx] = z;
                p0 *= z; p1 *= z; p2 *= z;

                // interpolated smooth normal (renormalized)
                float nx = p0 * vn[3*i0]   + p1 * vn[3*i1]   + p2 * vn[3*i2];
                float ny = p0 * vn[3*i0+1] + p1 * vn[3*i1+1] + p2 * vn[3*i2+1];
                float nz = p0 * vn[3*i0+2] + p1 * vn[3*i1+2] + p2 * vn[3*i2+2];
                float nl = std::sqrt(nx*nx + ny*ny + nz*nz);
                float diffuse = 0.0f, spec = 0.0f;
                if (nl > 1e-12f) {
                    nx /= nl; ny /= nl; nz /= nl;
                    // camera-space position of the pixel; view vector
                    // points from surface to the camera at the origin
                    float pxc = (xx - px) / fx * z;
                    float pyc = (yy - py) / fy * z;
                    float vnorm = std::sqrt(pxc*pxc + pyc*pyc + z*z);
                    float vx = -pxc / vnorm, vy = -pyc / vnorm, vz = -z / vnorm;
                    // orient the normal toward the viewer (two-sided)
                    if (nx * vx + ny * vy + nz * vz < 0.0f) {
                        nx = -nx; ny = -ny; nz = -nz;
                    }
                    diffuse = std::max(0.0f, nx * lx + ny * ly + nz * lz);
                    // Blinn-Phong half vector
                    float hx = vx + lx, hy = vy + ly, hz = vz + lz;
                    float hn = std::sqrt(hx*hx + hy*hy + hz*hz);
                    if (hn > 1e-12f) {
                        float ndh = std::max(0.0f, (nx*hx + ny*hy + nz*hz) / hn);
                        spec = ks * std::pow(ndh, shininess) * diffuse;
                    }
                }
                float shade = ambient + kd * diffuse;
                for (int c = 0; c < 3; ++c) {
                    float col = p0 * colors[3 * i0 + c] + p1 * colors[3 * i1 + c]
                              + p2 * colors[3 * i2 + c];
                    // metallic specular: lobe tinted toward the albedo
                    float spec_col = spec * (metallic * col + (1.0f - metallic) * 255.0f);
                    float v = col * shade + spec_col;
                    out_img[3 * idx + c] = (uint8_t)std::min(255.0f, std::max(0.0f, v));
                }
            }
        }
    }
}

}  // extern "C"
