// The 8 dataset-curation CLI tools, C++ ports of the reference Rust bins
// (reference: src/bin/*.rs).  Built both as one multi-call binary
// (chimera-tools <cmd> ...) and as per-command symlink-style binaries whose
// argv[0] selects the command — mirroring the reference's separate bins.

#include <algorithm>
#include <cstdio>
#include <fstream>
#include <map>
#include <set>
#include <sstream>
#include <unordered_map>
#include <unordered_set>

#include "args.h"
#include "bam.h"
#include "fastq.h"

using namespace chimera;

// ---------------------------------------------------------------- extractsa
// Extract primary chimeric (SA-tagged) reads (reference: extractsa.rs:36-83).
// Deviation: output goes to --output (or <bam>.chimeric.bam), not stdout.
static int CmdExtractSa(Args& args) {
  auto pos = args.Positional({"max-reads", "m", "threads", "t", "output", "o"});
  if (pos.empty()) {
    std::fprintf(stderr, "usage: extractsa <bam> [-m max_reads] [-t threads] [-o out.bam]\n");
    return 2;
  }
  long max_reads = args.GetInt("max-reads", args.GetInt("m", 0));
  int threads = static_cast<int>(args.GetInt("threads", args.GetInt("t", 2)));
  std::string out = args.Get("output", args.Get("o", pos[0] + ".chimeric.bam"));

  double t0 = NowSeconds();
  BamReader reader(pos[0], threads);
  BamWriter writer(out, reader.header(), threads);
  BamRecord rec;
  long n = 0;
  while (reader.Next(&rec)) {
    if (!IsChimeric(rec)) continue;
    if (max_reads > 0 && n >= max_reads) break;
    writer.Write(rec);
    ++n;
  }
  writer.Close();
  std::fprintf(stderr, "extracted %ld chimeric reads -> %s\n", n, out.c_str());
  std::fprintf(stderr, "elapsed time: %.2fs\n", NowSeconds() - t0);
  return 0;
}

// ------------------------------------------------------------------ annotate
// Label dirty-BAM chimeric events by support in clean BAMs
// (reference: annotate.rs:157-261).
static bool CheckOverlap(const GenomicInterval& a, const GenomicInterval& b, long thr) {
  if (a.chr != b.chr) return false;
  return std::llabs(a.start - b.start) <= thr && std::llabs(a.end - b.end) <= thr;
}

static bool SameEvent(const ChimericEvent& a, const ChimericEvent& b, long thr) {
  if (a.intervals.size() != b.intervals.size()) return false;
  for (size_t i = 0; i < a.intervals.size(); ++i)
    if (!CheckOverlap(a.intervals[i], b.intervals[i], thr)) return false;
  return true;
}

static std::string BaseName(const std::string& path) {
  size_t slash = path.find_last_of('/');
  return slash == std::string::npos ? path : path.substr(slash + 1);
}

static std::string WithExtension(const std::string& path, const std::string& ext) {
  // Rust Path::with_extension replaces the last extension component.
  std::string base = path;
  size_t slash = base.find_last_of('/');
  size_t dot = base.find_last_of('.');
  if (dot != std::string::npos && (slash == std::string::npos || dot > slash))
    base = base.substr(0, dot);
  return base + "." + ext;
}

static void WriteChimericEvents(const std::vector<ChimericEvent>& events, const std::string& path) {
  std::ofstream out(path);
  for (const auto& ev : events) {
    out << ev.name << '\t' << ev.intervals.size() << '\t';
    for (size_t i = 0; i < ev.intervals.size(); ++i) {
      const auto& iv = ev.intervals[i];
      if (i) out << ',';
      out << iv.chr << ':' << iv.start << '-' << iv.end;
    }
    out << '\n';
  }
  std::fprintf(stderr, "write %zu chimeric events to %s\n", events.size(), path.c_str());
}

static int CmdAnnotate(Args& args) {
  auto cbams = args.Many("cbam");
  auto dbams = args.Many("dbam");
  long thr = args.GetInt("ovr-threshold", 1000);
  int threads = static_cast<int>(args.GetInt("threads", args.GetInt("t", 2)));
  bool out_events = args.Has("output-chimeric-events");
  if (cbams.empty() || dbams.empty()) {
    std::fprintf(stderr,
                 "usage: annotate --cbam clean.bam [--cbam ...] --dbam dirty.bam "
                 "[--ovr-threshold N] [--output-chimeric-events]\n");
    return 2;
  }
  double t0 = NowSeconds();

  std::map<std::string, std::vector<ChimericEvent>> clean, dirty;
  {
    ThreadPool pool(threads);
    std::vector<std::future<std::pair<std::string, std::vector<ChimericEvent>>>> futs;
    for (const auto& p : cbams)
      futs.push_back(pool.submit([p, threads] {
        return std::make_pair(p, ChimericEventsFromBam(p, std::max(1, threads / 2)));
      }));
    for (const auto& p : dbams)
      futs.push_back(pool.submit([p, threads] {
        return std::make_pair(p, ChimericEventsFromBam(p, std::max(1, threads / 2)));
      }));
    for (size_t i = 0; i < futs.size(); ++i) {
      auto [path, events] = futs[i].get();
      (i < cbams.size() ? clean : dirty)[path] = std::move(events);
    }
  }
  for (auto& [path, events] : clean) {
    std::fprintf(stderr, "%s collect %zu chimeric events\n", path.c_str(), events.size());
    if (out_events) WriteChimericEvents(events, WithExtension(path, "chimeric_events.txt"));
  }
  for (auto& [path, events] : dirty) {
    std::fprintf(stderr, "%s collect %zu chimeric events\n", path.c_str(), events.size());
    if (out_events) WriteChimericEvents(events, WithExtension(path, "chimeric_events.txt"));
  }

  for (const auto& [dpath, devents] : dirty) {
    std::vector<std::pair<std::string, std::vector<std::string>>> read_sups(devents.size());
    ThreadPool pool(threads);
    std::vector<std::future<void>> futs;
    size_t shard = (devents.size() + threads - 1) / std::max(threads, 1);
    for (size_t s = 0; s < devents.size(); s += shard) {
      size_t e = std::min(s + shard, devents.size());
      futs.push_back(pool.submit([&, s, e] {
        for (size_t i = s; i < e; ++i) {
          const auto& ev = devents[i];
          std::vector<std::string> sups;
          for (const auto& [cpath, cevents] : clean) {
            bool hit = false;
            for (const auto& cev : cevents)
              if (SameEvent(ev, cev, thr)) {
                hit = true;
                break;
              }
            if (hit) sups.push_back(BaseName(cpath));
          }
          read_sups[i] = {ev.name, std::move(sups)};
        }
      }));
    }
    for (auto& f : futs) f.get();

    std::string out_path = WithExtension(dpath, "threshold_" + std::to_string(thr) + ".sup.txt");
    std::ofstream out(out_path);
    for (const auto& [name, sups] : read_sups) {
      out << name << '\t' << sups.size();
      if (!sups.empty()) {
        out << '\t';
        for (size_t i = 0; i < sups.size(); ++i) {
          if (i) out << ',';
          out << sups[i];
        }
      }
      out << '\n';
    }
    std::fprintf(stderr, "writing %zu reads to %s\n", read_sups.size(), out_path.c_str());
  }
  std::fprintf(stderr, "elapsed time: %.2fs\n", NowSeconds() - t0);
  return 0;
}

// ---------------------------------------------------------------- VCF common
struct SvRecord {
  std::string chr;
  std::string sv_type;
  long bp1 = 0;
  long bp2 = 0;
  std::vector<std::string> read_names;
};

static std::vector<SvRecord> ReadVcfSvs(const std::string& path, bool need_end) {
  std::ifstream in(path);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::vector<SvRecord> out;
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::vector<std::string> cols;
    std::stringstream ss(line);
    std::string col;
    while (std::getline(ss, col, '\t')) cols.push_back(col);
    if (cols.size() < 8) continue;
    SvRecord sv;
    sv.chr = cols[0];
    sv.bp1 = std::stol(cols[1]);
    std::string rnames, svtype, endv;
    std::stringstream info(cols[7]);
    std::string field;
    while (std::getline(info, field, ';')) {
      if (field.rfind("RNAMES=", 0) == 0) rnames = field.substr(7);
      else if (field.rfind("SVTYPE=", 0) == 0) svtype = field.substr(7);
      else if (field.rfind("END=", 0) == 0) endv = field.substr(4);
    }
    if (rnames.empty() || svtype.empty()) continue;
    if (need_end && endv.empty()) continue;
    sv.sv_type = svtype;
    if (!endv.empty()) sv.bp2 = std::stol(endv);
    std::stringstream rs(rnames);
    std::string r;
    while (std::getline(rs, r, ',')) sv.read_names.push_back(r);
    out.push_back(std::move(sv));
  }
  return out;
}

// ---------------------------------------------------------------- annotatesv
// Compare dirty-vs-clean SVs by chr/type/breakpoint tolerance
// (reference: annotatesv.rs:149-264).
static int CmdAnnotateSv(Args& args) {
  auto cvcfs = args.Many("cvcf");
  auto dvcfs = args.Many("dvcf");
  long thr = args.GetInt("threshold", 1000);
  if (cvcfs.empty() || dvcfs.empty()) {
    std::fprintf(stderr, "usage: annotatesv --cvcf clean.vcf --dvcf dirty.vcf [--threshold N]\n");
    return 2;
  }
  double t0 = NowSeconds();
  std::map<std::string, std::vector<SvRecord>> clean;
  for (const auto& p : cvcfs) clean[p] = ReadVcfSvs(p, true);

  auto compare_sv = [&](const SvRecord& c, const SvRecord& d) {
    if (c.chr != d.chr || c.sv_type != d.sv_type) return false;
    return std::labs(c.bp1 - d.bp2) <= thr || std::labs(c.bp2 - d.bp2) <= thr;
  };

  for (const auto& dpath : dvcfs) {
    auto dirty = ReadVcfSvs(dpath, true);
    std::string out_path = WithExtension(dpath, "annotated_sv_" + std::to_string(thr) + ".tsv");
    std::ofstream out(out_path);
    out << "dirty_sv\tdirty_sv_type\tnumber_clean_sv\tclean_sv\tmatched_read_names_in_dirty\n";
    for (const auto& d : dirty) {
      std::vector<std::string> matched;
      for (const auto& [cpath, csvs] : clean) {
        for (const auto& c : csvs)
          if (compare_sv(c, d)) {
            matched.push_back(cpath);
            break;
          }
      }
      std::string joined;
      for (size_t i = 0; i < matched.size(); ++i) {
        if (i) joined += ',';
        joined += matched[i];
      }
      std::string reads;
      for (size_t i = 0; i < d.read_names.size(); ++i) {
        if (i) reads += ',';
        reads += d.read_names[i];
      }
      out << d.chr << ':' << d.bp1 << '-' << d.bp2 << '\t' << d.sv_type << '\t' << matched.size()
          << '\t' << joined << '\t' << reads << '\n';
    }
    std::fprintf(stderr, "Writing annotated SV result to %s\n", out_path.c_str());
  }
  std::fprintf(stderr, "elapsed time: %.2fs\n", NowSeconds() - t0);
  return 0;
}

// -------------------------------------------------------------- getsvfromvcf
// VCF -> read_name\tSVTYPE support table (reference: getsvfromvcf.rs:72-120).
static int CmdGetSvFromVcf(Args& args) {
  auto pos = args.Positional({"threads", "t", "output-prefix", "o"});
  if (pos.empty()) {
    std::fprintf(stderr, "usage: getsvfromvcf <vcf>\n");
    return 2;
  }
  auto svs = ReadVcfSvs(pos[0], false);
  std::map<std::string, std::vector<std::string>> per_read;
  for (const auto& sv : svs)
    for (const auto& r : sv.read_names) per_read[r].push_back(sv.sv_type);
  std::string out_path = pos[0] + ".sv.read.sup.txt";
  std::ofstream out(out_path);
  for (const auto& [read, types] : per_read)
    for (const auto& t : types) out << read << '\t' << t << '\n';
  std::fprintf(stderr, "read %zu svs, summary %zu reads -> %s\n", svs.size(), per_read.size(),
               out_path.c_str());
  return 0;
}

// ----------------------------------------------------------------- addtarget
// Append |1 / |0 to FASTQ read names from pos/neg name lists
// (reference: addtarget.rs:43-78).
static std::set<std::string> LoadNames(const std::string& path) {
  std::ifstream in(path);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::set<std::string> out;
  std::string line;
  while (std::getline(in, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n')) line.pop_back();
    if (!line.empty()) out.insert(line);
  }
  return out;
}

static int CmdAddTarget(Args& args) {
  std::string fq = args.Get("fq");
  std::string pos_f = args.Get("pos");
  std::string neg_f = args.Get("neg");
  int threads = static_cast<int>(args.GetInt("threads", args.GetInt("t", 2)));
  if (fq.empty() || pos_f.empty() || neg_f.empty()) {
    std::fprintf(stderr, "usage: addtarget --fq reads.fq --pos pos.txt --neg neg.txt\n");
    return 2;
  }
  double t0 = NowSeconds();
  auto pos = LoadNames(pos_f);
  auto neg = LoadNames(neg_f);
  std::fprintf(stderr, "pos reads: %zu\nneg reads: %zu\n", pos.size(), neg.size());
  auto records = ReadFastq(fq);
  std::fprintf(stderr, "add target for records: %zu\n", records.size());
  for (auto& r : records) {
    if (pos.count(r.name)) r.name += "|1";
    else if (neg.count(r.name)) r.name += "|0";
  }
  // file_stem + ".target.fq.gz" (reference: addtarget.rs:64-67)
  std::string stem = BaseName(fq);
  size_t dot = stem.find_last_of('.');
  if (dot != std::string::npos) stem = stem.substr(0, dot);
  std::string out_path = stem + ".target.fq.gz";
  std::fprintf(stderr, "write to %s\n", out_path.c_str());
  WriteFastq(records, out_path, threads);
  std::fprintf(stderr, "elapsed time: %.2fs\n", NowSeconds() - t0);
  return 0;
}

// ------------------------------------------------------------------- summary
// Summarize a .sup.txt into {support_count: n_reads} + per-read JSON
// (reference: summary.rs:37-70).
static int CmdSummary(Args& args) {
  auto pos = args.Positional({"threads", "t", "output-prefix", "o"});
  if (pos.empty()) {
    std::fprintf(stderr, "usage: summary <support.txt> [-o prefix]\n");
    return 2;
  }
  std::ifstream in(pos[0]);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", pos[0].c_str());
    return 1;
  }
  std::unordered_map<std::string, long> result;
  std::map<long, long> counts;
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    std::string id, cnt;
    std::getline(ss, id, '\t');
    std::getline(ss, cnt, '\t');
    long c = std::stol(cnt);
    result[id] = c;
    counts[c]++;
  }
  std::string prefix = args.Get("output-prefix", args.Get("o", ""));
  if (prefix.empty()) {
    prefix = BaseName(pos[0]);
    size_t dot = prefix.find_last_of('.');
    if (dot != std::string::npos) prefix = prefix.substr(0, dot);
  }
  std::fprintf(stderr, "stat: {");
  for (auto it = counts.begin(); it != counts.end(); ++it)
    std::fprintf(stderr, "%s%ld: %ld", it == counts.begin() ? "" : ", ", it->first, it->second);
  std::fprintf(stderr, "}\n");
  std::ofstream out(prefix + ".json");
  out << "{";
  bool first = true;
  for (const auto& [id, c] : result) {
    if (!first) out << ",";
    first = false;
    out << "\"" << id << "\":" << c;
  }
  out << "}";
  std::fprintf(stderr, "wrote %s.json\n", prefix.c_str());
  return 0;
}

// ------------------------------------------------------------------- compare
// Parse/validate chimeric_events.txt back into events (reference: compare.rs:30-53).
static int CmdCompare(Args& args) {
  auto pos = args.Positional({"threads", "t", "output-prefix", "o"});
  if (pos.empty()) {
    std::fprintf(stderr, "usage: compare <chimeric_events.txt>\n");
    return 2;
  }
  std::ifstream in(pos[0]);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", pos[0].c_str());
    return 1;
  }
  std::string line;
  long n = 0;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    std::string name, cnt, list;
    std::getline(ss, name, '\t');
    std::getline(ss, cnt, '\t');
    std::getline(ss, list, '\t');
    auto ev = ParseChimericEvent(list, name);
    if (static_cast<long>(ev.intervals.size()) != std::stol(cnt)) {
      std::fprintf(stderr, "count mismatch for %s\n", name.c_str());
      return 1;
    }
    ++n;
  }
  std::fprintf(stderr, "collect %ld events from %s\n", n, pos[0].c_str());
  return 0;
}

// --------------------------------------------------------------------- query
static int CmdQuery(Args&) {
  std::printf("Hello, world!\n");
  return 0;
}

// ---------------------------------------------------------------------- main
int Dispatch(const std::string& cmd, Args& args) {
  if (cmd == "extractsa") return CmdExtractSa(args);
  if (cmd == "annotate") return CmdAnnotate(args);
  if (cmd == "annotatesv") return CmdAnnotateSv(args);
  if (cmd == "getsvfromvcf") return CmdGetSvFromVcf(args);
  if (cmd == "addtarget") return CmdAddTarget(args);
  if (cmd == "summary") return CmdSummary(args);
  if (cmd == "compare") return CmdCompare(args);
  if (cmd == "query") return CmdQuery(args);
  std::fprintf(stderr,
               "unknown command %s; available: extractsa annotate annotatesv getsvfromvcf "
               "addtarget summary compare query\n",
               cmd.c_str());
  return 2;
}

int main(int argc, char** argv) {
  std::string prog = argv[0];
  std::string base = prog.substr(prog.find_last_of('/') + 1);
  try {
    if (base != "chimera-tools") {
      Args args(argc, argv);
      return Dispatch(base, args);
    }
    if (argc < 2) {
      Args args(argc, argv);
      return Dispatch("help", args);
    }
    Args args(argc - 1, argv + 1);
    return Dispatch(argv[1], args);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
