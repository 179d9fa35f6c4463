// Tiny CLI flag parser shared by the tool binaries (clap stand-in).
#pragma once

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace chimera {

class Args {
 public:
  Args(int argc, char** argv) {
    for (int i = 1; i < argc; ++i) argv_.emplace_back(argv[i]);
  }

  // --name value (repeatable)
  std::vector<std::string> Many(const std::string& flag) {
    std::vector<std::string> out;
    for (size_t i = 0; i + 1 < argv_.size(); ++i)
      if (argv_[i] == "--" + flag || argv_[i] == "-" + flag) out.push_back(argv_[i + 1]);
    return out;
  }

  std::string Get(const std::string& flag, const std::string& dflt = "") {
    auto v = Many(flag);
    return v.empty() ? dflt : v.back();
  }

  long GetInt(const std::string& flag, long dflt) {
    auto v = Get(flag);
    return v.empty() ? dflt : std::stol(v);
  }

  bool Has(const std::string& flag) {
    for (const auto& a : argv_)
      if (a == "--" + flag || a == "-" + flag) return true;
    return false;
  }

  // positional args (not starting with '-', not a flag's value)
  std::vector<std::string> Positional(const std::vector<std::string>& value_flags) {
    std::vector<std::string> out;
    for (size_t i = 0; i < argv_.size(); ++i) {
      const auto& a = argv_[i];
      if (a.size() > 1 && a[0] == '-') {
        std::string name = a.substr(a[1] == '-' ? 2 : 1);
        for (const auto& vf : value_flags)
          if (name == vf) {
            ++i;
            break;
          }
        continue;
      }
      out.push_back(a);
    }
    return out;
  }

 private:
  std::vector<std::string> argv_;
};

inline double NowSeconds() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

}  // namespace chimera
