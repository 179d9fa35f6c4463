#include "bam.h"

#include <algorithm>
#include <cstring>

namespace chimera {

static const char kNibble[] = "=ACMGRSVTWYHKDBN";

std::vector<uint8_t> BamHeader::ToBytes() const {
  std::vector<uint8_t> out;
  out.insert(out.end(), {'B', 'A', 'M', 1});
  int32_t l_text = static_cast<int32_t>(text.size());
  auto push_i32 = [&out](int32_t v) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(&v);
    out.insert(out.end(), p, p + 4);
  };
  push_i32(l_text);
  out.insert(out.end(), text.begin(), text.end());
  push_i32(static_cast<int32_t>(refs.size()));
  for (const auto& [name, len] : refs) {
    push_i32(static_cast<int32_t>(name.size() + 1));
    out.insert(out.end(), name.begin(), name.end());
    out.push_back(0);
    push_i32(len);
  }
  return out;
}

template <typename T>
static T ReadAt(const std::vector<uint8_t>& raw, size_t off) {
  T v;
  std::memcpy(&v, raw.data() + off, sizeof(T));
  return v;
}

int32_t BamRecord::ref_id() const { return ReadAt<int32_t>(raw, 0); }
int32_t BamRecord::pos() const { return ReadAt<int32_t>(raw, 4); }
uint8_t BamRecord::l_read_name() const { return raw[8]; }
uint16_t BamRecord::n_cigar_op() const { return ReadAt<uint16_t>(raw, 12); }
uint16_t BamRecord::flag() const { return ReadAt<uint16_t>(raw, 14); }
int32_t BamRecord::l_seq() const { return ReadAt<int32_t>(raw, 16); }

std::string BamRecord::name() const {
  return std::string(reinterpret_cast<const char*>(raw.data() + 32), l_read_name() - 1);
}

std::string BamRecord::seq() const {
  int32_t n = l_seq();
  std::string out(n, 'N');
  const uint8_t* p = raw.data() + seq_off();
  for (int32_t i = 0; i < n; ++i) {
    uint8_t b = p[i / 2];
    out[i] = kNibble[(i % 2) ? (b & 0xF) : (b >> 4)];
  }
  return out;
}

int32_t BamRecord::ref_len() const {
  int32_t len = 0;
  size_t off = cigar_off();
  for (int i = 0; i < n_cigar_op(); ++i) {
    uint32_t v = ReadAt<uint32_t>(raw, off + 4 * i);
    uint32_t op = v & 0xF, n = v >> 4;
    // MIDNSHP=X : ref-consuming ops are M(0) D(2) N(3) =(7) X(8)
    if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) len += n;
  }
  return len;
}

static size_t TagValueLen(const std::vector<uint8_t>& raw, size_t off, uint8_t typ) {
  switch (typ) {
    case 'A':
    case 'c':
    case 'C':
      return 1;
    case 's':
    case 'S':
      return 2;
    case 'i':
    case 'I':
    case 'f':
      return 4;
    case 'Z':
    case 'H': {
      size_t end = off;
      while (end < raw.size() && raw[end] != 0) ++end;
      return end - off + 1;  // include NUL
    }
    case 'B': {
      uint8_t sub = raw[off];
      uint32_t count = ReadAt<uint32_t>(raw, off + 1);
      size_t esz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
      return 5 + count * esz;
    }
    default:
      throw std::runtime_error("unknown tag type");
  }
}

bool BamRecord::HasTag(const char tag[2]) const {
  size_t off = tag_off();
  while (off + 3 <= raw.size()) {
    bool match = raw[off] == static_cast<uint8_t>(tag[0]) && raw[off + 1] == static_cast<uint8_t>(tag[1]);
    uint8_t typ = raw[off + 2];
    off += 3;
    size_t len = TagValueLen(raw, off, typ);
    if (match) return true;
    off += len;
  }
  return false;
}

std::optional<std::string> BamRecord::GetStringTag(const char tag[2]) const {
  size_t off = tag_off();
  while (off + 3 <= raw.size()) {
    bool match = raw[off] == static_cast<uint8_t>(tag[0]) && raw[off + 1] == static_cast<uint8_t>(tag[1]);
    uint8_t typ = raw[off + 2];
    off += 3;
    size_t len = TagValueLen(raw, off, typ);
    if (match && (typ == 'Z' || typ == 'H'))
      return std::string(reinterpret_cast<const char*>(raw.data() + off), len - 1);
    off += len;
  }
  return std::nullopt;
}

BamReader::BamReader(const std::string& path, int threads) : bgzf_(path, threads) {
  uint8_t magic[4];
  if (!bgzf_.ReadExact(magic, 4) || std::memcmp(magic, "BAM\1", 4) != 0)
    throw std::runtime_error(path + ": not a BAM file");
  int32_t l_text;
  bgzf_.ReadExact(&l_text, 4);
  header_.text.resize(l_text);
  bgzf_.ReadExact(header_.text.data(), l_text);
  int32_t n_ref;
  bgzf_.ReadExact(&n_ref, 4);
  header_.refs.reserve(n_ref);
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name;
    bgzf_.ReadExact(&l_name, 4);
    std::string name(l_name, 0);
    bgzf_.ReadExact(name.data(), l_name);
    name.resize(l_name - 1);  // drop NUL
    int32_t l_ref;
    bgzf_.ReadExact(&l_ref, 4);
    header_.refs.emplace_back(std::move(name), l_ref);
  }
}

bool BamReader::Next(BamRecord* out) {
  int32_t block_size;
  size_t got = bgzf_.Read(&block_size, 4);
  if (got < 4) return false;
  out->raw.resize(block_size);
  if (!bgzf_.ReadExact(out->raw.data(), block_size)) throw std::runtime_error("truncated record");
  return true;
}

BamWriter::BamWriter(const std::string& path, const BamHeader& header, int threads, int level)
    : bgzf_(path, threads, level) {
  auto bytes = header.ToBytes();
  bgzf_.Write(bytes.data(), bytes.size());
}

void BamWriter::Write(const BamRecord& rec) {
  int32_t n = static_cast<int32_t>(rec.raw.size());
  bgzf_.Write(&n, 4);
  bgzf_.Write(rec.raw.data(), rec.raw.size());
}

int64_t CigarRefLen(const std::string& cigar) {
  int64_t len = 0, n = 0;
  for (char c : cigar) {
    if (c >= '0' && c <= '9') {
      n = n * 10 + (c - '0');
    } else {
      if (c == 'M' || c == 'D' || c == 'N' || c == '=' || c == 'X') len += n;
      n = 0;
    }
  }
  return len;
}

std::vector<ChimericEvent> ChimericEventsFromBam(const std::string& path, int threads) {
  BamReader reader(path, threads);
  const auto& refs = reader.header().refs;
  std::vector<ChimericEvent> events;
  BamRecord rec;
  const char sa_tag[2] = {'S', 'A'};
  while (reader.Next(&rec)) {
    if (!IsChimeric(rec)) continue;
    ChimericEvent ev;
    ev.name = rec.name();
    int32_t rid = rec.ref_id();
    std::string chr = (rid >= 0 && rid < static_cast<int32_t>(refs.size())) ? refs[rid].first : "*";
    int64_t start = rec.pos();
    ev.intervals.push_back({chr, start, start + rec.ref_len()});
    auto sa = rec.GetStringTag(sa_tag);
    if (sa) {
      // SA:Z: rname,pos,strand,CIGAR,mapQ,NM; ...  pos is 1-based
      const std::string& s = *sa;
      size_t i = 0;
      while (i < s.size()) {
        size_t j = s.find(';', i);
        if (j == std::string::npos) j = s.size();
        std::string entry = s.substr(i, j - i);
        i = j + 1;
        if (entry.empty()) continue;
        std::vector<std::string> f;
        size_t k = 0;
        while (k <= entry.size()) {
          size_t c = entry.find(',', k);
          if (c == std::string::npos) c = entry.size();
          f.push_back(entry.substr(k, c - k));
          k = c + 1;
        }
        if (f.size() < 4) continue;
        int64_t p1 = std::stoll(f[1]) - 1;  // 0-based
        ev.intervals.push_back({f[0], p1, p1 + CigarRefLen(f[3])});
      }
    }
    std::sort(ev.intervals.begin(), ev.intervals.end(), [](const auto& a, const auto& b) {
      return std::tie(a.chr, a.start, a.end) < std::tie(b.chr, b.start, b.end);
    });
    events.push_back(std::move(ev));
  }
  return events;
}

ChimericEvent ParseChimericEvent(const std::string& list, const std::string& name) {
  ChimericEvent ev;
  ev.name = name;
  size_t i = 0;
  while (i < list.size()) {
    size_t j = list.find(',', i);
    if (j == std::string::npos) j = list.size();
    std::string item = list.substr(i, j - i);
    i = j + 1;
    size_t colon = item.rfind(':');
    size_t dash = item.rfind('-');
    if (colon == std::string::npos || dash == std::string::npos || dash < colon)
      throw std::runtime_error("bad interval: " + item);
    ev.intervals.push_back({item.substr(0, colon),
                            std::stoll(item.substr(colon + 1, dash - colon - 1)),
                            std::stoll(item.substr(dash + 1))});
  }
  return ev;
}

}  // namespace chimera
