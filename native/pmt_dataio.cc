// PMT-TPU native data runtime: fused stereo-sample decode.
//
// The reference's input pipeline is Python (skimage/cv2/PIL per file,
// utilTorchDataLoader.py:133-258). Here the whole per-sample decode —
// left/right PNG, depth PNG -> disparity (f*b/Z, utilTorchDataLoader.py:
// 57-58,176-179), blue-channel one-hot seg (:197-208), instance->sobel
// edges (:152-155), activation normalization (:186-195) and mean/std
// normalize — runs in one C call per batch, fanned out over a thread pool
// while Python's GIL is released (ctypes).
//
// C ABI only (no pybind11 in this image). Build: native/build.sh
#include <png.h>
#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode (libpng), 8-bit, gray or RGB(A); returns channels actually read.
// ---------------------------------------------------------------------------
int pmt_png_info(const char* path, int* h, int* w, int* c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  *c = (color == PNG_COLOR_TYPE_GRAY) ? 1
       : (color == PNG_COLOR_TYPE_GRAY_ALPHA) ? 2
       : (color == PNG_COLOR_TYPE_RGB) ? 3
       : (color == PNG_COLOR_TYPE_PALETTE) ? 3
                                           : 4;
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decodes into out (h*w*3, RGB uint8). Gray expands, alpha drops, 16-bit
// strips to 8.
int pmt_read_png_rgb(const char* path, uint8_t* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int W = png_get_image_width(png, info);
  int H = png_get_image_height(png, info);
  if (H != h || W != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  std::vector<png_bytep> rows(H);
  for (int y = 0; y < H; y++) rows[y] = out + (size_t)y * W * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Sobel binary edges from a gray image (skimage-equivalent: /4 kernels,
// symmetric padding; ops/edges.py sobel_edges).
// ---------------------------------------------------------------------------
static void sobel_edges_u8(const uint8_t* gray, float* out, int h, int w) {
  auto at = [&](int y, int x) -> float {
    y = y < 0 ? 0 : (y >= h ? h - 1 : y);
    x = x < 0 ? 0 : (x >= w ? w - 1 : x);
    return (float)gray[(size_t)y * w + x];
  };
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      float gx = (at(y - 1, x + 1) + 2 * at(y, x + 1) + at(y + 1, x + 1)) -
                 (at(y - 1, x - 1) + 2 * at(y, x - 1) + at(y + 1, x - 1));
      float gy = (at(y + 1, x - 1) + 2 * at(y + 1, x) + at(y + 1, x + 1)) -
                 (at(y - 1, x - 1) + 2 * at(y - 1, x) + at(y - 1, x + 1));
      out[(size_t)y * w + x] = (gx != 0.f || gy != 0.f) ? 1.f : 0.f;
    }
  }
}

// ---------------------------------------------------------------------------
// Fused ROSeS sample decode.
// activation: 0 linear, 1 sigmoid, 2 tanh (utilTorchDataLoader.py:186-195)
// ---------------------------------------------------------------------------
struct SamplePaths {
  const char* left;
  const char* right;
  const char* depth;
  const char* seg;
  const char* inst;
};

static int decode_one(const SamplePaths& p, int h, int w, int n_labels,
                      float fb, int activation, float max_d,
                      const float* mean, const float* stdv, float* left_out,
                      float* right_out, float* disp_out, float* seg_out,
                      float* edges_out) {
  std::vector<uint8_t> buf((size_t)h * w * 3);
  // left / right: RGB normalized (x/255 - mean)/std
  for (int side = 0; side < 2; side++) {
    const char* path = side == 0 ? p.left : p.right;
    float* dst = side == 0 ? left_out : right_out;
    if (pmt_read_png_rgb(path, buf.data(), h, w) != 0) return -1;
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++) {
      for (int c = 0; c < 3; c++) {
        dst[i * 3 + c] =
            ((float)buf[i * 3 + c] / 255.f - mean[c]) / stdv[c];
      }
    }
  }
  // depth png (BGR-equal channels) -> disparity
  if (pmt_read_png_rgb(p.depth, buf.data(), h, w) != 0) return -2;
  {
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++) {
      float z = (float)buf[i * 3];
      float d = z > 0.f ? fb / z : 0.f;
      if (activation != 0 && d > max_d) d = max_d;  // clamp unless linear
      if (activation == 1) d = d / max_d;
      if (activation == 2) d = d != 0.f ? 2.f * d / max_d - 1.f : -1.f;
      disp_out[i] = d;
    }
  }
  // seg png: blue channel > 128 => class 1 one-hot (RGB layout -> idx 2)
  if (pmt_read_png_rgb(p.seg, buf.data(), h, w) != 0) return -3;
  {
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++) {
      int cls = buf[i * 3 + 2] > 128 ? 1 : 0;
      for (int c = 0; c < n_labels; c++)
        seg_out[i * n_labels + c] = (c == cls) ? 1.f : 0.f;
    }
  }
  // instance png -> sobel edges (channel 0 as gray)
  if (pmt_read_png_rgb(p.inst, buf.data(), h, w) != 0) return -4;
  {
    std::vector<uint8_t> gray((size_t)h * w);
    for (size_t i = 0; i < (size_t)h * w; i++) gray[i] = buf[i * 3];
    sobel_edges_u8(gray.data(), edges_out, h, w);
  }
  return 0;
}

// Batch decode with a thread pool; paths arrays are length n each.
int pmt_decode_roses_batch(const char** left, const char** right,
                           const char** depth, const char** seg,
                           const char** inst, int n, int h, int w,
                           int n_labels, float fb, int activation,
                           float max_d, const float* mean, const float* stdv,
                           float* left_out, float* right_out, float* disp_out,
                           float* seg_out, float* edges_out, int n_threads) {
  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) break;
      SamplePaths p{left[i], right[i], depth[i], seg[i], inst[i]};
      size_t img = (size_t)h * w;
      int rc = decode_one(
          p, h, w, n_labels, fb, activation, max_d, mean, stdv,
          left_out + i * img * 3, right_out + i * img * 3, disp_out + i * img,
          seg_out + i * img * n_labels, edges_out + i * img);
      if (rc != 0) err.store(rc);
    }
  };
  int t = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  for (int i = 0; i < t; i++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// 16-bit gray PNG read (kitti/cityscapes disparity x256 pngs). Returns the
// RAW sample values: 16-bit stays 16-bit (byte-swapped to host order),
// 8-bit widens without scaling — matching cv2.IMREAD_UNCHANGED.
// ---------------------------------------------------------------------------
int pmt_read_png_gray16(const char* path, uint16_t* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_palette_to_rgb(png);
  png_set_strip_alpha(png);
  // collapse color to gray like cv2 would for a disp png (they are gray)
  int color = png_get_color_type(png, info);
  if (color & PNG_COLOR_MASK_COLOR)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (bit_depth == 16) png_set_swap(png);  // big-endian file -> host LE
  png_read_update_info(png, info);
  int W = png_get_image_width(png, info);
  int H = png_get_image_height(png, info);
  if (H != h || W != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  if (bit_depth == 16) {
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; y++)
      rows[y] = (png_bytep)(out + (size_t)y * W);
    png_read_image(png, rows.data());
  } else {
    std::vector<uint8_t> buf((size_t)H * W);
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; y++) rows[y] = buf.data() + (size_t)y * W;
    png_read_image(png, rows.data());
    for (size_t i = 0; i < (size_t)H * W; i++) out[i] = buf[i];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Fused kitti/cityscapes sample decode: uint16 disp png / 256, labelId ->
// trainId LUT one-hot over n_classes channels (ignore = 255 -> the LAST
// channel, utilCityscape.py:173-186), instance sobel edges.
// ---------------------------------------------------------------------------
static int decode_one_city(const SamplePaths& p, int h, int w, int n_classes,
                           const uint8_t* lut, int activation, float max_d,
                           const float* mean, const float* stdv,
                           float* left_out, float* right_out, float* disp_out,
                           float* seg_out, float* edges_out) {
  std::vector<uint8_t> buf((size_t)h * w * 3);
  for (int side = 0; side < 2; side++) {
    const char* path = side == 0 ? p.left : p.right;
    float* dst = side == 0 ? left_out : right_out;
    if (pmt_read_png_rgb(path, buf.data(), h, w) != 0) return -1;
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++)
      for (int c = 0; c < 3; c++)
        dst[i * 3 + c] = ((float)buf[i * 3 + c] / 255.f - mean[c]) / stdv[c];
  }
  {
    std::vector<uint16_t> raw((size_t)h * w);
    if (pmt_read_png_gray16(p.depth, raw.data(), h, w) != 0) return -2;
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++) {
      float d = (float)raw[i] / 256.f;
      if (activation != 0 && d > max_d) d = max_d;
      if (activation == 1) d = d / max_d;
      if (activation == 2) d = d != 0.f ? 2.f * d / max_d - 1.f : -1.f;
      disp_out[i] = d;
    }
  }
  // labelId png (8-bit ids in channel 0) -> LUT -> one-hot
  if (pmt_read_png_rgb(p.seg, buf.data(), h, w) != 0) return -3;
  {
    size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; i++) {
      int tid = lut[buf[i * 3]];
      int cls = tid == 255 ? n_classes - 1 : tid;
      for (int c = 0; c < n_classes; c++)
        seg_out[i * n_classes + c] = (c == cls) ? 1.f : 0.f;
    }
  }
  if (pmt_read_png_rgb(p.inst, buf.data(), h, w) != 0) return -4;
  {
    std::vector<uint8_t> gray((size_t)h * w);
    for (size_t i = 0; i < (size_t)h * w; i++) gray[i] = buf[i * 3];
    sobel_edges_u8(gray.data(), edges_out, h, w);
  }
  return 0;
}

int pmt_decode_city_batch(const char** left, const char** right,
                          const char** disp, const char** seg,
                          const char** inst, int n, int h, int w,
                          int n_classes, const uint8_t* lut, int activation,
                          float max_d, const float* mean, const float* stdv,
                          float* left_out, float* right_out, float* disp_out,
                          float* seg_out, float* edges_out, int n_threads) {
  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) break;
      SamplePaths p{left[i], right[i], disp[i], seg[i], inst[i]};
      size_t img = (size_t)h * w;
      int rc = decode_one_city(
          p, h, w, n_classes, lut, activation, max_d, mean, stdv,
          left_out + i * img * 3, right_out + i * img * 3, disp_out + i * img,
          seg_out + i * img * n_classes, edges_out + i * img);
      if (rc != 0) err.store(rc);
    }
  };
  int t = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  for (int i = 0; i < t; i++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// PFM (little endian) read: returns 0 and fills out (h*w floats, top-down).
int pmt_read_pfm(const char* path, float* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  char header[3] = {0};
  int W, H;
  float scale;
  if (fscanf(fp, "%2s\n%d %d\n%f\n", header, &W, &H, &scale) != 4 ||
      strcmp(header, "Pf") != 0 || W != w || H != h) {
    fclose(fp);
    return -2;
  }
  std::vector<float> rows((size_t)h * w);
  if (fread(rows.data(), 4, (size_t)h * w, fp) != (size_t)h * w) {
    fclose(fp);
    return -3;
  }
  fclose(fp);
  // pfm is bottom-up
  for (int y = 0; y < h; y++)
    memcpy(out + (size_t)y * w, rows.data() + (size_t)(h - 1 - y) * w,
           (size_t)w * 4);
  return 0;
}

int pmt_version() { return 1; }

}  // extern "C"
