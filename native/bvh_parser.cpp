// Fast BVH parser — native host-side data plane for physicsvae_tpu.
//
// The reference delegated all native heavy lifting to external C++ libraries
// (PyBullet's URDF loader, fairmotion's readers).  This library is the
// framework's own native IO path: it parses BVH hierarchy + channel data into
// flat arrays that the Python layer wraps as numpy without copying.
//
// C ABI (consumed via ctypes from physicsvae_tpu/kinematics/native.py):
//   bvh_parse(path) -> handle (NULL on failure)
//   accessors for joints/frames/channels/data
//   bvh_free(handle)
//
// Build: make -C native   (produces libpvae_host.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Joint {
  std::string name;
  int parent;
  float offset[3];
  std::vector<int> channels;  // 0..2: X/Y/Zposition, 3..5: X/Y/Zrotation
};

struct BvhFile {
  std::vector<Joint> joints;
  int num_frames = 0;
  double frame_time = 1.0 / 30.0;
  int total_channels = 0;
  std::vector<float> data;  // num_frames * total_channels
};

struct Tokenizer {
  const char* p;
  const char* end;
  explicit Tokenizer(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  bool next(std::string& out) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
    if (p >= end) return false;
    const char* start = p;
    while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
      ++p;
    out.assign(start, p - start);
    return true;
  }
};

int channel_code(const std::string& c) {
  if (c == "Xposition") return 0;
  if (c == "Yposition") return 1;
  if (c == "Zposition") return 2;
  if (c == "Xrotation") return 3;
  if (c == "Yrotation") return 4;
  if (c == "Zrotation") return 5;
  return -1;
}

}  // namespace

extern "C" {

void* bvh_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* bvh = new BvhFile();
  Tokenizer tok(buf);
  std::string t;
  std::vector<int> stack;

  if (!tok.next(t) || t != "HIERARCHY") { delete bvh; return nullptr; }

  while (tok.next(t)) {
    if (t == "ROOT" || t == "JOINT") {
      Joint j;
      tok.next(j.name);
      j.parent = stack.empty() ? -1 : stack.back();
      j.offset[0] = j.offset[1] = j.offset[2] = 0.f;
      tok.next(t);  // {
      stack.push_back((int)bvh->joints.size());
      bvh->joints.push_back(std::move(j));
    } else if (t == "OFFSET") {
      float o[3];
      for (int k = 0; k < 3; ++k) { tok.next(t); o[k] = strtof(t.c_str(), nullptr); }
      if (!stack.empty())
        memcpy(bvh->joints[stack.back()].offset, o, sizeof(o));
    } else if (t == "CHANNELS") {
      tok.next(t);
      int n = atoi(t.c_str());
      auto& ch = bvh->joints[stack.back()].channels;
      for (int k = 0; k < n; ++k) {
        tok.next(t);
        ch.push_back(channel_code(t));
      }
    } else if (t == "End") {
      tok.next(t);  // Site
      tok.next(t);  // {
      tok.next(t);  // OFFSET
      tok.next(t); tok.next(t); tok.next(t);
      tok.next(t);  // }
    } else if (t == "}") {
      stack.pop_back();
    } else if (t == "MOTION") {
      break;
    } else {
      delete bvh;
      return nullptr;
    }
  }

  tok.next(t);  // Frames:
  tok.next(t);
  bvh->num_frames = atoi(t.c_str());
  tok.next(t); tok.next(t);  // Frame Time:
  tok.next(t);
  bvh->frame_time = strtod(t.c_str(), nullptr);

  for (auto& j : bvh->joints) bvh->total_channels += (int)j.channels.size();
  bvh->data.resize((size_t)bvh->num_frames * bvh->total_channels);
  size_t n = bvh->data.size();
  for (size_t i = 0; i < n; ++i) {
    if (!tok.next(t)) { delete bvh; return nullptr; }
    bvh->data[i] = strtof(t.c_str(), nullptr);
  }
  return bvh;
}

int bvh_num_joints(void* h) { return (int)((BvhFile*)h)->joints.size(); }
int bvh_num_frames(void* h) { return ((BvhFile*)h)->num_frames; }
double bvh_frame_time(void* h) { return ((BvhFile*)h)->frame_time; }
int bvh_total_channels(void* h) { return ((BvhFile*)h)->total_channels; }

const char* bvh_joint_name(void* h, int j) {
  return ((BvhFile*)h)->joints[j].name.c_str();
}
int bvh_parent(void* h, int j) { return ((BvhFile*)h)->joints[j].parent; }

void bvh_offsets(void* h, float* out) {
  auto* b = (BvhFile*)h;
  for (size_t j = 0; j < b->joints.size(); ++j)
    memcpy(out + 3 * j, b->joints[j].offset, 3 * sizeof(float));
}

int bvh_num_channels(void* h, int j) {
  return (int)((BvhFile*)h)->joints[j].channels.size();
}
void bvh_channels(void* h, int j, int* out) {
  auto& ch = ((BvhFile*)h)->joints[j].channels;
  for (size_t k = 0; k < ch.size(); ++k) out[k] = ch[k];
}

void bvh_data(void* h, float* out) {
  auto* b = (BvhFile*)h;
  memcpy(out, b->data.data(), b->data.size() * sizeof(float));
}

void bvh_free(void* h) { delete (BvhFile*)h; }

}  // extern "C"
