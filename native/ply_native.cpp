// Native IO runtime for the TPU registration framework.
//
// Fast PLY vertex-cloud reader/writer plus exact-duplicate filtering —
// the host-side data-loader work that the reference does through PCL's
// PLYReader (include/io.h) and filterDuplicatePoints (common.cpp:417-427).
// The compute path stays in JAX/XLA; this module only feeds it.
//
// Plain C ABI for ctypes.  All cloud payloads cross the boundary as
// float32 column matrices.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <unordered_set>

namespace {

struct Prop {
    std::string name;
    int size;     // bytes
    char kind;    // 'f' float, 'i' int, 'u' uint
};

struct PlyFile {
    std::vector<Prop> props;
    int64_t n_vertex = 0;
    int format = 0;  // 0 ascii, 1 binary_le, 2 binary_be
    std::vector<float> data;  // n_vertex x n_props, row major
    std::string names_joined;
};

int prop_from_token(const std::string& t, Prop* p) {
    if (t == "char" || t == "int8") { p->size = 1; p->kind = 'i'; }
    else if (t == "uchar" || t == "uint8") { p->size = 1; p->kind = 'u'; }
    else if (t == "short" || t == "int16") { p->size = 2; p->kind = 'i'; }
    else if (t == "ushort" || t == "uint16") { p->size = 2; p->kind = 'u'; }
    else if (t == "int" || t == "int32") { p->size = 4; p->kind = 'i'; }
    else if (t == "uint" || t == "uint32") { p->size = 4; p->kind = 'u'; }
    else if (t == "float" || t == "float32") { p->size = 4; p->kind = 'f'; }
    else if (t == "double" || t == "float64") { p->size = 8; p->kind = 'f'; }
    else return -1;
    return 0;
}

float parse_scalar(const uint8_t* src, const Prop& p, bool swap) {
    uint8_t buf[8];
    std::memcpy(buf, src, p.size);
    if (swap) {
        for (int i = 0; i < p.size / 2; ++i) std::swap(buf[i], buf[p.size - 1 - i]);
    }
    switch (p.kind) {
        case 'f':
            if (p.size == 4) { float v; std::memcpy(&v, buf, 4); return v; }
            else { double v; std::memcpy(&v, buf, 8); return (float)v; }
        case 'i':
            if (p.size == 1) { int8_t v; std::memcpy(&v, buf, 1); return (float)v; }
            if (p.size == 2) { int16_t v; std::memcpy(&v, buf, 2); return (float)v; }
            { int32_t v; std::memcpy(&v, buf, 4); return (float)v; }
        default:
            if (p.size == 1) { uint8_t v = buf[0]; return (float)v; }
            if (p.size == 2) { uint16_t v; std::memcpy(&v, buf, 2); return (float)v; }
            { uint32_t v; std::memcpy(&v, buf, 4); return (float)v; }
    }
}

}  // namespace

extern "C" {

// Returns opaque handle or nullptr.
void* ply_open(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* ply = new PlyFile();
    char line[4096];
    bool in_vertex = false;
    bool first_element_vertex = false;
    int n_elements = 0;
    if (!std::fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3) != 0) {
        std::fclose(f); delete ply; return nullptr;
    }
    while (std::fgets(line, sizeof line, f)) {
        std::string s(line);
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
        if (s.rfind("format ", 0) == 0) {
            if (s.find("ascii") != std::string::npos) ply->format = 0;
            else if (s.find("binary_little_endian") != std::string::npos) ply->format = 1;
            else ply->format = 2;
        } else if (s.rfind("element ", 0) == 0) {
            char name[256]; long long cnt = 0;
            if (std::sscanf(s.c_str(), "element %255s %lld", name, &cnt) == 2) {
                in_vertex = std::strcmp(name, "vertex") == 0;
                if (in_vertex) {
                    ply->n_vertex = cnt;
                    if (n_elements == 0) first_element_vertex = true;
                }
                n_elements++;
            }
        } else if (s.rfind("property ", 0) == 0 && in_vertex) {
            char t[64], n[256];
            if (std::sscanf(s.c_str(), "property %63s %255s", t, n) == 2) {
                if (std::strcmp(t, "list") == 0) { std::fclose(f); delete ply; return nullptr; }
                Prop p; p.name = n;
                if (prop_from_token(t, &p) != 0) { std::fclose(f); delete ply; return nullptr; }
                ply->props.push_back(p);
            }
        } else if (s == "end_header") {
            break;
        }
    }
    if (!first_element_vertex || ply->props.empty() || ply->n_vertex < 0) {
        std::fclose(f); delete ply; return nullptr;
    }
    const int64_t n = ply->n_vertex;
    const size_t np = ply->props.size();
    ply->data.resize((size_t)n * np);
    if (ply->format == 0) {
        for (int64_t i = 0; i < n; ++i) {
            for (size_t j = 0; j < np; ++j) {
                double v;
                if (std::fscanf(f, "%lf", &v) != 1) { std::fclose(f); delete ply; return nullptr; }
                ply->data[(size_t)i * np + j] = (float)v;
            }
        }
    } else {
        size_t stride = 0;
        for (auto& p : ply->props) stride += p.size;
        std::vector<uint8_t> buf((size_t)n * stride);
        if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f); delete ply; return nullptr;
        }
        const bool swap = ply->format == 2;
        bool all_f32_le = !swap;
        for (auto& p : ply->props) all_f32_le = all_f32_le && p.kind == 'f' && p.size == 4;
        if (all_f32_le) {
            std::memcpy(ply->data.data(), buf.data(), buf.size());
        } else {
            #pragma omp parallel for schedule(static)
            for (int64_t i = 0; i < n; ++i) {
                const uint8_t* row = buf.data() + (size_t)i * stride;
                size_t off = 0;
                for (size_t j = 0; j < np; ++j) {
                    ply->data[(size_t)i * np + j] = parse_scalar(row + off, ply->props[j], swap);
                    off += ply->props[j].size;
                }
            }
        }
    }
    std::fclose(f);
    for (size_t j = 0; j < np; ++j) {
        if (j) ply->names_joined += ",";
        ply->names_joined += ply->props[j].name;
    }
    return ply;
}

int64_t ply_n_vertex(void* h) { return static_cast<PlyFile*>(h)->n_vertex; }
int64_t ply_n_props(void* h) { return (int64_t)static_cast<PlyFile*>(h)->props.size(); }
const char* ply_prop_names(void* h) { return static_cast<PlyFile*>(h)->names_joined.c_str(); }

void ply_copy_data(void* h, float* out) {
    auto* ply = static_cast<PlyFile*>(h);
    std::memcpy(out, ply->data.data(), ply->data.size() * sizeof(float));
}

void ply_close(void* h) { delete static_cast<PlyFile*>(h); }

// columns: n_cols arrays of length n; kinds[c]: 0 float32 prop, 1 uchar prop.
int ply_write(const char* path, const char* names_csv, const int* kinds,
              const float* const* columns, int n_cols, int64_t n, int binary) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    std::fprintf(f, "ply\nformat %s 1.0\nelement vertex %lld\n",
                 binary ? "binary_little_endian" : "ascii", (long long)n);
    // split names
    std::vector<std::string> names;
    {
        std::string s(names_csv), cur;
        for (char c : s) { if (c == ',') { names.push_back(cur); cur.clear(); } else cur += c; }
        names.push_back(cur);
    }
    for (int c = 0; c < n_cols; ++c)
        std::fprintf(f, "property %s %s\n", kinds[c] ? "uchar" : "float", names[c].c_str());
    std::fprintf(f, "end_header\n");
    if (binary) {
        size_t stride = 0;
        for (int c = 0; c < n_cols; ++c) stride += kinds[c] ? 1 : 4;
        std::vector<uint8_t> buf((size_t)n * stride);
        #pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) {
            uint8_t* row = buf.data() + (size_t)i * stride;
            size_t off = 0;
            for (int c = 0; c < n_cols; ++c) {
                if (kinds[c]) { row[off] = (uint8_t)columns[c][i]; off += 1; }
                else { std::memcpy(row + off, &columns[c][i], 4); off += 4; }
            }
        }
        std::fwrite(buf.data(), 1, buf.size(), f);
    } else {
        for (int64_t i = 0; i < n; ++i) {
            for (int c = 0; c < n_cols; ++c)
                std::fprintf(f, "%s%g", c ? " " : "", columns[c][i]);
            std::fprintf(f, "\n");
        }
    }
    std::fclose(f);
    return 0;
}

// Exact duplicate removal on xyz triples; returns new count.  keep[] gets
// 1 for rows to keep (first occurrence wins, like the reference's
// unordered_set pass in common.cpp:417-427 but order preserving).
int64_t dedup_points(const float* xyz, int64_t n, uint8_t* keep) {
    struct Key { float x, y, z; bool operator==(const Key& o) const {
        return x == o.x && y == o.y && z == o.z; } };
    struct Hash { size_t operator()(const Key& k) const {
        size_t seed = 0;
        auto mix = [&seed](float v) {
            uint32_t u; std::memcpy(&u, &v, 4);
            seed ^= std::hash<uint32_t>()(u) + 0x9e3779b9 + (seed << 6) + (seed >> 2);
        };
        mix(k.x); mix(k.y); mix(k.z); return seed; } };
    std::unordered_set<Key, Hash> seen;
    seen.reserve((size_t)n);
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
        Key k{xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]};
        if (seen.insert(k).second) { keep[i] = 1; kept++; } else keep[i] = 0;
    }
    return kept;
}

}  // extern "C"
