// ggpm_chem — native cheminformatics kernel (C++17, no dependencies).
//
// Fast path for the host-side chemistry pipeline of ggpm_tpu: SMILES parse,
// valence/implicit-H model, ring perception (bridges + minimum cycle basis),
// aromaticity perception, kekulization, Morgan canonical ranking, and
// canonical SMILES writing.  Semantics mirror ggpm_tpu/chem/*.py exactly —
// the two implementations are differential-tested over the full datasets
// (tests/test_native.py); vocabularies built with either are identical.
//
// Exposed via a minimal C ABI (ctypes): see ggpm_tpu/chem/native.py.
//
// Build:  g++ -O3 -fPIC -shared -std=c++17 -o libggpm_chem.so ggpm_chem.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <optional>
#include <set>
#include <string>
#include <tuple>
#include <vector>

namespace {

// ---------------------------------------------------------------- elements
struct ElementInfo {
  const char* sym;
  int atomic_num;
  std::vector<int> valences;
};

static const std::map<std::string, ElementInfo>& elements() {
  static const std::map<std::string, ElementInfo> tbl = {
      {"*", {"*", 0, {}}},       {"H", {"H", 1, {1}}},
      {"B", {"B", 5, {3}}},      {"C", {"C", 6, {4}}},
      {"N", {"N", 7, {3}}},      {"O", {"O", 8, {2}}},
      {"F", {"F", 9, {1}}},      {"Si", {"Si", 14, {4}}},
      {"P", {"P", 15, {3, 5}}},  {"S", {"S", 16, {2, 4, 6}}},
      {"Cl", {"Cl", 17, {1}}},   {"Se", {"Se", 34, {2, 4, 6}}},
      {"Br", {"Br", 35, {1}}},   {"I", {"I", 53, {1, 3, 5}}},
  };
  return tbl;
}

static int atomic_num(const std::string& s) {
  auto it = elements().find(s);
  return it == elements().end() ? 99 : it->second.atomic_num;
}

// charge-adjusted valence list — mirrors elements.allowed_valences
static std::vector<int> allowed_valences(const std::string& sym, int charge) {
  static const std::map<std::pair<std::string, int>, int> delta = {
      {{"N", 1}, 4},  {{"N", -1}, 2}, {{"O", 1}, 3},  {{"O", -1}, 1},
      {{"C", 1}, 3},  {{"C", -1}, 3}, {{"S", 1}, 3},  {{"S", -1}, 1},
      {{"P", 1}, 4},  {{"P", -1}, 2}, {{"B", -1}, 4}, {{"Se", 1}, 3},
      {{"I", 1}, 2},  {{"Cl", 1}, 2}, {{"Br", 1}, 2}, {{"Si", -1}, 5},
  };
  if (charge != 0) {
    auto it = delta.find({sym, charge});
    if (it != delta.end()) return {it->second};
    auto base = elements().find(sym);
    if (base == elements().end()) return {};
    bool shift_up = (sym == "N" || sym == "O" || sym == "P" || sym == "S" ||
                     sym == "Se");
    int shift = shift_up ? charge : -std::abs(charge);
    std::vector<int> out;
    for (int v : base->second.valences) out.push_back(std::max(0, v + shift));
    return out;
  }
  auto it = elements().find(sym);
  return it == elements().end() ? std::vector<int>{} : it->second.valences;
}

static int implicit_h(const std::string& sym, int charge, int bonded) {
  for (int v : allowed_valences(sym, charge))
    if (v >= bonded) return v - bonded;
  return 0;
}

static int max_valence(const std::string& sym, int charge) {
  auto vs = allowed_valences(sym, charge);
  return vs.empty() ? 0 : *std::max_element(vs.begin(), vs.end());
}

// -------------------------------------------------------------------- mol
struct Atom {
  std::string symbol;
  int charge = 0;
  int explicit_h = -1;  // -1 = implicit
  bool aromatic = false;
  int map_num = 0;
  int isotope = 0;
};

struct Bond {
  int a1, a2;
  int order = 1;  // 1/2/3
  bool aromatic = false;
  int other(int i) const { return i == a1 ? a2 : a1; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices
  // ring info (computed by perceive_rings)
  std::vector<bool> atom_ring, bond_ring;
  std::vector<std::vector<int>> sssr;

  int add_atom(const Atom& a) {
    atoms.push_back(a);
    adj.emplace_back();
    return (int)atoms.size() - 1;
  }
  int add_bond(int a1, int a2, int order, bool arom) {
    Bond b{a1, a2, order, arom};
    bonds.push_back(b);
    int idx = (int)bonds.size() - 1;
    adj[a1].push_back(idx);
    adj[a2].push_back(idx);
    return idx;
  }
  int bond_between(int a1, int a2) const {
    for (int b : adj[a1])
      if (bonds[b].other(a1) == a2) return b;
    return -1;
  }
  int degree(int i) const { return (int)adj[i].size(); }
  int bonded_valence(int i) const {
    int s = 0;
    for (int b : adj[i]) s += bonds[b].order;
    return s;
  }
  int total_h(int i) const {
    const Atom& a = atoms[i];
    if (a.explicit_h >= 0) return a.explicit_h;
    return implicit_h(a.symbol, a.charge, bonded_valence(i));
  }
  bool valence_ok(int i) const {
    const Atom& a = atoms[i];
    if (a.symbol == "*") return true;
    int bonded = bonded_valence(i) + std::max(0, a.explicit_h);
    int mv = max_valence(a.symbol, a.charge);
    return mv == 0 || bonded <= mv;
  }
};

// ------------------------------------------------------------------ parse
struct ParseError {};

static bool is_two_letter(const std::string& s, size_t i) {
  if (i + 1 >= s.size()) return false;
  std::string two = s.substr(i, 2);
  return two == "Cl" || two == "Br" || two == "Si" || two == "Se";
}

static Atom parse_bracket(const std::string& body) {
  Atom a;
  size_t i = 0, n = body.size();
  while (i < n && isdigit(body[i])) a.isotope = a.isotope * 10 + (body[i++] - '0');
  if (i >= n) throw ParseError{};
  // symbol (possibly lowercase aromatic, possibly two letters)
  if (islower(body[i])) {
    a.aromatic = true;
    std::string sym(1, toupper(body[i]));
    if (i + 1 < n && islower(body[i + 1]) &&
        (body.substr(i, 2) == "se" || body.substr(i, 2) == "si")) {
      sym += body[i + 1];
      i += 2;
    } else {
      i += 1;
    }
    a.symbol = sym;
  } else {
    std::string sym(1, body[i]);
    if (i + 1 < n && islower(body[i + 1]) && body[i + 1] != 'h') {
      sym += body[i + 1];
      i += 2;
    } else {
      i += 1;
    }
    a.symbol = sym;
  }
  // chirality markers (parsed and discarded)
  while (i < n && body[i] == '@') {
    i++;
    if (i + 1 < n && (body.substr(i, 2) == "TH" || body.substr(i, 2) == "AL" ||
                      body.substr(i, 2) == "SP" || body.substr(i, 2) == "TB" ||
                      body.substr(i, 2) == "OH")) {
      i += 2;
      while (i < n && isdigit(body[i])) i++;
    }
  }
  a.explicit_h = 0;
  if (i < n && body[i] == 'H') {
    i++;
    a.explicit_h = 1;
    if (i < n && isdigit(body[i])) {
      a.explicit_h = 0;
      while (i < n && isdigit(body[i])) a.explicit_h = a.explicit_h * 10 + (body[i++] - '0');
    }
  }
  if (i < n && (body[i] == '+' || body[i] == '-')) {
    char c = body[i];
    int cnt = 0;
    while (i < n && body[i] == c) { cnt++; i++; }
    if (i < n && isdigit(body[i]) && cnt == 1) {
      cnt = 0;
      while (i < n && isdigit(body[i])) cnt = cnt * 10 + (body[i++] - '0');
    }
    a.charge = (c == '+') ? cnt : -cnt;
  }
  if (i < n && body[i] == ':') {
    i++;
    int m = 0;
    while (i < n && isdigit(body[i])) m = m * 10 + (body[i++] - '0');
    a.map_num = m;
  }
  if (i != n) throw ParseError{};
  return a;
}

static const int ORD_AROMATIC = 4;

static Mol parse_smiles(const std::string& raw) {
  // mirror of ggpm_tpu/chem/parse.py::_parse
  std::string s;
  for (char c : raw)
    if (!isspace((unsigned char)c)) s += c;
  Mol mol;
  std::vector<int> branch_stack;
  int prev = -1;
  int pending = 0;  // 0 = none; else order (4 = aromatic marker ':')
  std::map<int, std::pair<int, int>> ring_map;  // digit -> (atom, order)

  auto attach = [&](int idx) {
    if (prev >= 0) {
      int o = pending;
      if (o == 0)
        o = (mol.atoms[prev].aromatic && mol.atoms[idx].aromatic) ? ORD_AROMATIC
                                                                  : 1;
      mol.add_bond(prev, idx, o == ORD_AROMATIC ? 1 : o, o == ORD_AROMATIC);
    }
    pending = 0;
    prev = idx;
  };
  auto ring = [&](int num, int order) {
    auto it = ring_map.find(num);
    if (it == ring_map.end()) {
      ring_map[num] = {prev, order};
      return;
    }
    auto [a_prev, o_prev] = it->second;
    ring_map.erase(it);
    int o = order != 0 ? order : o_prev;
    if (prev < 0) throw ParseError{};
    if (o == 0)
      o = (mol.atoms[a_prev].aromatic && mol.atoms[prev].aromatic)
              ? ORD_AROMATIC
              : 1;
    if (a_prev == prev || mol.bond_between(a_prev, prev) >= 0)
      throw ParseError{};
    mol.add_bond(a_prev, prev, o == ORD_AROMATIC ? 1 : o, o == ORD_AROMATIC);
  };

  size_t i = 0, n = s.size();
  while (i < n) {
    char ch = s[i];
    if (ch == '(') {
      if (prev < 0) throw ParseError{};
      branch_stack.push_back(prev);
      i++;
    } else if (ch == ')') {
      if (branch_stack.empty()) throw ParseError{};
      prev = branch_stack.back();
      branch_stack.pop_back();
      pending = 0;
      i++;
    } else if (ch == '[') {
      size_t j = s.find(']', i);
      if (j == std::string::npos) throw ParseError{};
      attach(mol.add_atom(parse_bracket(s.substr(i + 1, j - i - 1))));
      i = j + 1;
    } else if (ch == '-' || ch == '/' || ch == '\\' || ch == '~') {
      pending = 1;
      i++;
    } else if (ch == '=') {
      pending = 2;
      i++;
    } else if (ch == '#') {
      pending = 3;
      i++;
    } else if (ch == ':') {
      pending = ORD_AROMATIC;
      i++;
    } else if (ch == '%') {
      if (i + 2 >= n || !isdigit(s[i + 1]) || !isdigit(s[i + 2]))
        throw ParseError{};
      ring((s[i + 1] - '0') * 10 + (s[i + 2] - '0'), pending);
      pending = 0;
      i += 3;
    } else if (isdigit(ch)) {
      ring(ch - '0', pending);
      pending = 0;
      i++;
    } else if (ch == '.') {
      prev = -1;
      pending = 0;
      i++;
    } else if (is_two_letter(s, i)) {
      Atom a;
      a.symbol = s.substr(i, 2);
      attach(mol.add_atom(a));
      i += 2;
    } else if (i + 1 < n && (s.substr(i, 2) == "se" || s.substr(i, 2) == "si")) {
      Atom a;
      a.symbol = s.substr(i, 2);
      a.symbol[0] = toupper(a.symbol[0]);
      a.aromatic = true;
      attach(mol.add_atom(a));
      i += 2;
    } else if (strchr("BCNOPSFI*", ch)) {
      Atom a;
      a.symbol = std::string(1, ch);
      attach(mol.add_atom(a));
      i++;
    } else if (strchr("bcnops", ch)) {
      Atom a;
      a.symbol = std::string(1, toupper(ch));
      a.aromatic = true;
      attach(mol.add_atom(a));
      i++;
    } else {
      throw ParseError{};
    }
  }
  if (!ring_map.empty() || !branch_stack.empty()) throw ParseError{};
  return mol;
}

// ------------------------------------------------------ rings (mirror mol.py)
static void perceive_rings(Mol& mol) {
  int n = (int)mol.atoms.size();
  int m = (int)mol.bonds.size();
  mol.atom_ring.assign(n, false);
  mol.bond_ring.assign(m, false);
  mol.sssr.clear();
  if (m == 0) return;

  // bridges via iterative Tarjan
  std::vector<int> disc(n, -1), low(n, 0);
  std::vector<bool> bridge(m, false);
  int timer = 0;
  for (int root = 0; root < n; root++) {
    if (disc[root] != -1) continue;
    // (vertex, parent bond, adj position)
    std::vector<std::tuple<int, int, size_t>> stack;
    stack.push_back({root, -1, 0});
    disc[root] = low[root] = timer++;
    while (!stack.empty()) {
      auto& [v, pb, pos] = stack.back();
      bool advanced = false;
      while (pos < mol.adj[v].size()) {
        int bidx = mol.adj[v][pos++];
        if (bidx == pb) continue;
        int w = mol.bonds[bidx].other(v);
        if (disc[w] == -1) {
          disc[w] = low[w] = timer++;
          stack.push_back({w, bidx, 0});
          advanced = true;
          break;
        } else {
          low[v] = std::min(low[v], disc[w]);
        }
      }
      if (!advanced && pos >= mol.adj[std::get<0>(stack.back())].size()) {
        auto [v2, pb2, _] = stack.back();
        stack.pop_back();
        if (!stack.empty()) {
          int u = std::get<0>(stack.back());
          low[u] = std::min(low[u], low[v2]);
          if (low[v2] > disc[u]) bridge[pb2] = true;
        }
      }
    }
  }
  std::vector<int> ring_bonds;
  for (int b = 0; b < m; b++)
    if (!bridge[b]) {
      ring_bonds.push_back(b);
      mol.bond_ring[b] = true;
      mol.atom_ring[mol.bonds[b].a1] = true;
      mol.atom_ring[mol.bonds[b].a2] = true;
    }
  if (ring_bonds.empty()) return;

  // minimum cycle basis (mirror _min_cycle_basis): shortest cycle through
  // each ring bond, greedy GF(2) independence
  std::set<int> ring_verts;
  for (int b : ring_bonds) {
    ring_verts.insert(mol.bonds[b].a1);
    ring_verts.insert(mol.bonds[b].a2);
  }
  // count components of ring subgraph
  std::map<int, std::vector<std::pair<int, int>>> sub_adj;
  for (int b : ring_bonds) {
    sub_adj[mol.bonds[b].a1].push_back({mol.bonds[b].a2, b});
    sub_adj[mol.bonds[b].a2].push_back({mol.bonds[b].a1, b});
  }
  std::set<int> seen;
  int ncomp = 0;
  for (auto& [start, _] : sub_adj) {
    if (seen.count(start)) continue;
    ncomp++;
    std::vector<int> st{start};
    seen.insert(start);
    while (!st.empty()) {
      int v = st.back();
      st.pop_back();
      for (auto& [w, bb] : sub_adj[v])
        if (!seen.count(w)) {
          seen.insert(w);
          st.push_back(w);
        }
    }
  }
  int rank_needed = (int)ring_bonds.size() - (int)ring_verts.size() + ncomp;

  struct Cand {
    std::vector<int> atoms;
    std::vector<int> bonds;
  };
  std::vector<Cand> cands;
  std::set<std::set<int>> dedup;
  for (int bidx : ring_bonds) {
    // BFS shortest path between endpoints avoiding the bond
    int src = mol.bonds[bidx].a1, dst = mol.bonds[bidx].a2;
    std::map<int, std::pair<int, int>> prevmap;  // v -> (prev, bond)
    prevmap[src] = {-1, -1};
    std::vector<int> q{src};
    bool found = false;
    while (!q.empty() && !found) {
      std::vector<int> nxt;
      for (int v : q) {
        for (auto& [w, eb] : sub_adj[v]) {
          if (eb == bidx || prevmap.count(w)) continue;
          prevmap[w] = {v, eb};
          if (w == dst) {
            found = true;
            break;
          }
          nxt.push_back(w);
        }
        if (found) break;
      }
      q = nxt;
    }
    if (!found) continue;
    Cand c;
    c.bonds.push_back(bidx);
    int cur = dst;
    while (cur != -1) {
      c.atoms.push_back(cur);
      auto [p, eb] = prevmap[cur];
      if (eb != -1) c.bonds.push_back(eb);
      cur = p;
    }
    std::set<int> key(c.bonds.begin(), c.bonds.end());
    if (dedup.insert(key).second) cands.push_back(std::move(c));
  }
  std::sort(cands.begin(), cands.end(), [](const Cand& a, const Cand& b) {
    if (a.bonds.size() != b.bonds.size())
      return a.bonds.size() < b.bonds.size();
    auto sa = a.atoms, sb = b.atoms;
    std::sort(sa.begin(), sa.end());
    std::sort(sb.begin(), sb.end());
    return sa < sb;
  });
  // GF(2) reduction over bond bitmasks (m ≤ a few hundred → use vector<bool>?
  // use 128-bit-chunk vectors)
  auto to_vec = [&](const std::vector<int>& bonds) {
    std::vector<uint64_t> v((m + 63) / 64, 0);
    for (int b : bonds) v[b / 64] |= (1ull << (b % 64));
    return v;
  };
  auto is_less = [](const std::vector<uint64_t>& a,
                    const std::vector<uint64_t>& b) {
    for (int i = (int)a.size() - 1; i >= 0; i--)
      if (a[i] != b[i]) return a[i] < b[i];
    return false;
  };
  std::vector<std::vector<uint64_t>> basis;
  for (auto& c : cands) {
    if ((int)mol.sssr.size() >= rank_needed) break;
    auto cur = to_vec(c.bonds);
    for (auto& row : basis) {
      auto x = cur;
      for (size_t i = 0; i < x.size(); i++) x[i] ^= row[i];
      if (is_less(x, cur)) cur = x;
    }
    bool zero = true;
    for (auto w : cur)
      if (w) zero = false;
    if (!zero) {
      basis.push_back(cur);
      std::sort(basis.begin(), basis.end(),
                [&](auto& a, auto& b) { return is_less(b, a); });
      mol.sssr.push_back(c.atoms);
    }
  }
}

// --------------------------------------------- aromaticity (mirror aromatic.py)
static int pi_contribution(const Mol& mol, int idx,
                           const std::set<int>& rset,
                           const std::set<int>& aromatic_atoms) {
  // returns electrons, or -1 if the atom cannot be aromatic
  const Atom& a = mol.atoms[idx];
  auto in_system = [&](int j) {
    return rset.count(j) || aromatic_atoms.count(j);
  };
  int deg = mol.degree(idx);
  bool dbl_in = false, dbl_out = false, has_triple = false;
  for (int b : mol.adj[idx]) {
    if (mol.bonds[b].order == 3) has_triple = true;
    if (mol.bonds[b].order == 2) {
      if (in_system(mol.bonds[b].other(idx)))
        dbl_in = true;
      else
        dbl_out = true;
    }
  }
  if (has_triple) return -1;
  const std::string& sym = a.symbol;
  int chg = a.charge;
  int h = mol.total_h(idx);
  if (sym == "C") {
    if (dbl_in) return 1;
    if (dbl_out) {
      for (int b : mol.adj[idx]) {
        int o = mol.bonds[b].other(idx);
        if (mol.bonds[b].order == 2 && !in_system(o) &&
            mol.atoms[o].symbol == "C")
          return -1;
      }
      return 0;
    }
    if (chg == -1 && deg + h <= 3) return 2;
    if (chg == 1 && deg + h <= 3) return 0;
    if (a.aromatic) return 1;
    return -1;
  }
  if (sym == "N" || sym == "P") {
    if (dbl_in) return 1;
    if (dbl_out) return chg == 1 ? 1 : 0;
    if (h > 0 || deg >= 3 || chg == -1) return 2;
    if (a.aromatic) return 1;
    return -1;
  }
  if (sym == "O" || sym == "S" || sym == "Se") {
    if (dbl_in) return chg == 1 ? 1 : -1;
    if (deg == 2) return 2;
    return -1;
  }
  if (sym == "B") return 0;
  if (sym == "Si") return dbl_in ? 1 : -1;
  return -1;
}

static void perceive_aromaticity(Mol& mol) {
  perceive_rings(mol);
  std::vector<std::vector<int>> rings;
  for (auto& r : mol.sssr)
    if (r.size() <= 8) rings.push_back(r);
  std::set<int> aromatic_atoms;
  bool changed = true;
  while (changed) {
    changed = false;
    for (auto& ring : rings) {
      std::set<int> rset(ring.begin(), ring.end());
      bool subset = true;
      for (int x : ring)
        if (!aromatic_atoms.count(x)) subset = false;
      if (subset) continue;
      int total = 0;
      bool ok = true;
      for (int idx : ring) {
        int c = pi_contribution(mol, idx, rset, aromatic_atoms);
        if (c < 0) {
          ok = false;
          break;
        }
        total += c;
      }
      if (ok && total % 4 == 2) {
        for (int x : ring) aromatic_atoms.insert(x);
        changed = true;
      }
    }
  }
  // commit flags (mirror aromatic.py commit section)
  std::set<int> aromatic_ring_bonds;
  for (auto& ring : rings) {
    bool all_arom = true;
    std::set<int> rset(ring.begin(), ring.end());
    for (int x : ring)
      if (!aromatic_atoms.count(x)) all_arom = false;
    if (!all_arom) continue;
    for (int x : ring)
      for (int b : mol.adj[x])
        if (rset.count(mol.bonds[b].other(x))) aromatic_ring_bonds.insert(b);
  }
  for (int i = 0; i < (int)mol.atoms.size(); i++)
    mol.atoms[i].aromatic = aromatic_atoms.count(i) > 0;
  for (int b = 0; b < (int)mol.bonds.size(); b++)
    mol.bonds[b].aromatic = aromatic_ring_bonds.count(b) > 0;
}

// ------------------------------------------------- kekulize (mirror aromatic.py)
static bool needs_pi(const Mol& mol, int idx) {
  const Atom& a = mol.atoms[idx];
  int deg = mol.degree(idx);
  bool has_double = false;
  for (int b : mol.adj[idx])
    if (mol.bonds[b].order == 2) has_double = true;
  if (has_double) return false;
  const std::string& sym = a.symbol;
  int chg = a.charge;
  if (sym == "C") return chg == 0;
  if (sym == "N" || sym == "P") {
    if (chg == -1) return false;
    if (chg == 1) {
      if (a.explicit_h <= 0) return deg <= 2;
      return deg + std::max(0, a.explicit_h) <= 3;
    }
    if (a.explicit_h > 0) return false;
    if (deg >= 3) return false;
    return true;
  }
  if (sym == "O" || sym == "S" || sym == "Se") return chg == 1;
  return false;
}

static bool match_backtrack(std::set<int>& unmatched,
                            const std::map<int, std::vector<std::pair<int, int>>>& adj,
                            std::set<int>& matched_bonds) {
  if (unmatched.empty()) return true;
  // lowest-degree-first vertex
  int best = -1, best_deg = 1 << 30;
  for (int v : unmatched) {
    int d = 0;
    auto it = adj.find(v);
    if (it != adj.end())
      for (auto& [w, bi] : it->second)
        if (unmatched.count(w)) d++;
    if (d < best_deg) {
      best_deg = d;
      best = v;
    }
  }
  auto it = adj.find(best);
  if (it == adj.end() || best_deg == 0) return false;
  for (auto& [w, bi] : it->second) {
    if (!unmatched.count(w)) continue;
    unmatched.erase(best);
    unmatched.erase(w);
    matched_bonds.insert(bi);
    if (match_backtrack(unmatched, adj, matched_bonds)) return true;
    matched_bonds.erase(bi);
    unmatched.insert(best);
    unmatched.insert(w);
  }
  return false;
}

static bool kekulize(Mol& mol) {
  std::set<int> needs;
  for (int i = 0; i < (int)mol.atoms.size(); i++)
    if (mol.atoms[i].aromatic && needs_pi(mol, i)) needs.insert(i);
  std::vector<int> arom_bonds;
  for (int b = 0; b < (int)mol.bonds.size(); b++)
    if (mol.bonds[b].aromatic) arom_bonds.push_back(b);
  if (needs.empty()) {
    for (int b : arom_bonds)
      if (mol.bonds[b].order != 2) mol.bonds[b].order = 1;
    return true;
  }
  std::map<int, std::vector<std::pair<int, int>>> adj;
  for (int b : arom_bonds) {
    int x = mol.bonds[b].a1, y = mol.bonds[b].a2;
    if (needs.count(x) && needs.count(y)) {
      adj[x].push_back({y, b});
      adj[y].push_back({x, b});
    }
  }
  std::set<int> matched;
  std::set<int> un = needs;
  if (!match_backtrack(un, adj, matched)) return false;
  for (int b : arom_bonds) mol.bonds[b].order = matched.count(b) ? 2 : 1;
  return true;
}

static bool sanitize_in_place(Mol& mol) {
  if (!kekulize(mol)) return false;
  perceive_aromaticity(mol);
  for (int i = 0; i < (int)mol.atoms.size(); i++)
    if (!mol.valence_ok(i)) return false;
  return true;
}

// --------------------------------------------------- canon (mirror canon.py)
using Invariant = std::tuple<int, int, int, int, int, int, int, int>;

static std::vector<int> refine(const Mol& mol, std::vector<int> ranks) {
  int n = (int)mol.atoms.size();
  int nclasses = (int)std::set<int>(ranks.begin(), ranks.end()).size();
  while (true) {
    std::vector<std::pair<int, std::vector<std::pair<int, int>>>> sigs(n);
    for (int i = 0; i < n; i++) {
      std::vector<std::pair<int, int>> neigh;
      for (int b : mol.adj[i]) {
        int order = mol.bonds[b].aromatic ? 9 : mol.bonds[b].order;
        neigh.push_back({order, ranks[mol.bonds[b].other(i)]});
      }
      std::sort(neigh.begin(), neigh.end());
      sigs[i] = {ranks[i], neigh};
    }
    std::vector<int> order(n);
    for (int i = 0; i < n; i++) order[i] = i;
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return sigs[a] < sigs[b]; });
    std::vector<int> new_ranks(n);
    int r = 0;
    for (int k = 0; k < n; k++) {
      if (k > 0 && sigs[order[k]] != sigs[order[k - 1]]) r++;
      new_ranks[order[k]] = r;
    }
    int nn = (int)std::set<int>(new_ranks.begin(), new_ranks.end()).size();
    if (nn == nclasses) return new_ranks;
    ranks = new_ranks;
    nclasses = nn;
  }
}

static std::vector<int> canonical_ranks(const Mol& mol, bool break_ties,
                                        bool use_maps = true) {
  int n = (int)mol.atoms.size();
  if (n == 0) return {};
  std::vector<Invariant> inv(n);
  for (int i = 0; i < n; i++) {
    const Atom& a = mol.atoms[i];
    inv[i] = {mol.degree(i), atomic_num(a.symbol), a.charge,
              mol.total_h(i), mol.atom_ring[i] ? 1 : 0, a.aromatic ? 1 : 0,
              use_maps ? a.map_num : 0, a.isotope};
  }
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return inv[a] < inv[b]; });
  std::vector<int> ranks(n);
  int r = 0;
  for (int k = 0; k < n; k++) {
    if (k > 0 && inv[order[k]] != inv[order[k - 1]]) r++;
    ranks[order[k]] = r;
  }
  ranks = refine(mol, ranks);
  if (!break_ties) return ranks;
  while ((int)std::set<int>(ranks.begin(), ranks.end()).size() < n) {
    std::map<int, int> counts;
    for (int x : ranks) counts[x]++;
    int target = -1;
    for (auto& [x, c] : counts)
      if (c > 1) {
        target = x;
        break;
      }
    int chosen = -1;
    for (int i = 0; i < n; i++)
      if (ranks[i] == target) {
        chosen = i;
        break;
      }
    for (int i = 0; i < n; i++) {
      if (ranks[i] == target)
        ranks[i] = ranks[i] * 2 + (i == chosen ? 0 : 1);
      else
        ranks[i] = ranks[i] * 2;
    }
    // normalize
    std::map<int, int> remap;
    std::set<int> uniq(ranks.begin(), ranks.end());
    int k = 0;
    for (int x : uniq) remap[x] = k++;
    for (int i = 0; i < n; i++) ranks[i] = remap[ranks[i]];
    ranks = refine(mol, ranks);
  }
  return ranks;
}

// --------------------------------------------------- write (mirror write.py)
static std::string atom_token(const Mol& mol, int idx, bool kekule) {
  const Atom& a = mol.atoms[idx];
  std::string sym = a.symbol;
  bool aromatic_out = a.aromatic && !kekule;
  int total_h = mol.total_h(idx);
  static const std::set<std::string> organic = {"B", "C", "N", "O", "P",
                                               "S", "F", "Cl", "Br", "I", "*"};
  bool bracket = a.charge != 0 || a.map_num > 0 || a.isotope != 0 ||
                 !organic.count(sym);
  if (!bracket && a.explicit_h >= 0) {
    int implied = implicit_h(sym, a.charge, mol.bonded_valence(idx));
    if (a.explicit_h != implied) bracket = true;
  }
  if (!bracket && aromatic_out && sym == "N" && total_h > 0) bracket = true;
  if (!bracket && aromatic_out) {
    int implied = implicit_h(sym, a.charge, mol.bonded_valence(idx));
    if (total_h != implied) bracket = true;
  }
  std::string body = sym;
  if (aromatic_out)
    for (auto& c : body) c = tolower(c);
  if (!bracket) return body;
  std::string t = "[";
  if (a.isotope) t += std::to_string(a.isotope);
  t += body;
  if (total_h == 1)
    t += "H";
  else if (total_h > 1)
    t += "H" + std::to_string(total_h);
  if (a.charge == 1)
    t += "+";
  else if (a.charge == -1)
    t += "-";
  else if (a.charge > 1)
    t += "+" + std::to_string(a.charge);
  else if (a.charge < -1)
    t += "-" + std::to_string(-a.charge);
  if (a.map_num) t += ":" + std::to_string(a.map_num);
  t += "]";
  return t;
}

static std::string bond_token(const Mol& mol, const Bond& b, bool kekule) {
  if (!kekule) {
    if (b.aromatic) return "";
    if (b.order == 1 && mol.atoms[b.a1].aromatic && mol.atoms[b.a2].aromatic)
      return "-";
  }
  if (b.order == 2) return "=";
  if (b.order == 3) return "#";
  return "";
}

struct Writer {
  const Mol& mol;
  const std::vector<int>& ranks;
  bool kekule;
  std::map<int, std::vector<std::pair<int, int>>> tree_children;
  std::map<int, std::vector<int>> back_edges;
  std::set<int> all_back;
  std::set<int> seen;
  std::map<int, int> closure_digit;
  std::vector<int> digits_free;
  std::string out;

  Writer(const Mol& m, const std::vector<int>& r, bool k)
      : mol(m), ranks(r), kekule(k) {
    for (int d = 1; d < 100; d++) digits_free.push_back(d);
  }

  std::vector<std::pair<int, int>> neighbors_sorted(int v, int parent_bond) {
    std::vector<std::pair<int, int>> items;  // (bond, atom)
    for (int b : mol.adj[v]) {
      if (b == parent_bond) continue;
      items.push_back({b, mol.bonds[b].other(v)});
    }
    std::sort(items.begin(), items.end(), [&](auto& x, auto& y) {
      if (ranks[x.second] != ranks[y.second])
        return ranks[x.second] < ranks[y.second];
      return x.first < y.first;
    });
    return items;
  }

  void explore(int v, int pb) {
    tree_children[v] = {};
    back_edges[v];
    for (auto& [b, w] : neighbors_sorted(v, pb)) {
      if (seen.count(w)) {
        if (!all_back.count(b)) {
          all_back.insert(b);
          back_edges[v].push_back(b);
        }
      } else {
        seen.insert(w);
        tree_children[v].push_back({b, w});
        explore(w, b);
      }
    }
  }

  std::string digit_token(int d) {
    if (d < 10) return std::to_string(d);
    char buf[16];
    snprintf(buf, sizeof buf, "%%%02d", d);
    return buf;
  }

  void write_atom(int v, int pb) {
    out += atom_token(mol, v, kekule);
    std::vector<int> closing;
    for (int b : mol.adj[v])
      if (b != pb && all_back.count(b)) closing.push_back(b);
    std::sort(closing.begin(), closing.end(), [&](int x, int y) {
      int rx = ranks[mol.bonds[x].other(v)], ry = ranks[mol.bonds[y].other(v)];
      if (rx != ry) return rx < ry;
      return x < y;
    });
    for (int b : closing) {
      const Bond& bond = mol.bonds[b];
      auto it = closure_digit.find(b);
      int d;
      if (it != closure_digit.end()) {
        d = it->second;
        closure_digit.erase(it);
        digits_free.insert(digits_free.begin(), d);
        std::sort(digits_free.begin(), digits_free.end());
      } else {
        d = digits_free.front();
        digits_free.erase(digits_free.begin());
        closure_digit[b] = d;
      }
      out += bond_token(mol, bond, kekule) + digit_token(d);
    }
    auto& children = tree_children[v];
    for (size_t k = 0; k < children.size(); k++) {
      auto [b, w] = children[k];
      bool last = (k + 1 == children.size());
      if (!last) out += "(";
      out += bond_token(mol, mol.bonds[b], kekule);
      write_atom(w, b);
      if (!last) out += ")";
    }
  }

  std::string run(int start) {
    seen.insert(start);
    explore(start, -1);
    write_atom(start, -1);
    return out;
  }
};

static std::string mol_to_smiles(const Mol& mol, bool kekule, int root = -1) {
  int n = (int)mol.atoms.size();
  if (n == 0) return "";
  std::vector<int> ranks = canonical_ranks(mol, true);
  // connected components
  std::vector<int> comp(n, -1);
  int nc = 0;
  for (int i = 0; i < n; i++) {
    if (comp[i] != -1) continue;
    std::vector<int> st{i};
    comp[i] = nc;
    while (!st.empty()) {
      int v = st.back();
      st.pop_back();
      for (int b : mol.adj[v]) {
        int w = mol.bonds[b].other(v);
        if (comp[w] == -1) {
          comp[w] = nc;
          st.push_back(w);
        }
      }
    }
    nc++;
  }
  // order components by min rank
  std::vector<std::pair<int, int>> comp_order;  // (min rank, comp)
  for (int c = 0; c < nc; c++) {
    int mr = 1 << 30;
    for (int i = 0; i < n; i++)
      if (comp[i] == c) mr = std::min(mr, ranks[i]);
    comp_order.push_back({mr, c});
  }
  std::sort(comp_order.begin(), comp_order.end());
  std::string result;
  for (size_t k = 0; k < comp_order.size(); k++) {
    int c = comp_order[k].second;
    int start = -1, best = 1 << 30;
    if (root >= 0 && comp[root] == c) {
      start = root;
    } else {
      for (int i = 0; i < n; i++)
        if (comp[i] == c && ranks[i] < best) {
          best = ranks[i];
          start = i;
        }
    }
    Writer w(mol, ranks, kekule);
    if (k) result += ".";
    result += w.run(start);
  }
  return result;
}

}  // namespace

// ------------------------------------------------------------------ C ABI
extern "C" {

// Parse + sanitize; write canonical SMILES into out (cap bytes).
// kekule != 0 → kekulé form.  Returns length, or -1 on failure.
int ggpm_canon_smiles(const char* smiles, int kekule, char* out, int cap) {
  try {
    Mol mol = parse_smiles(smiles);
    if (!sanitize_in_place(mol)) return -1;
    std::string s = mol_to_smiles(mol, kekule != 0);
    if ((int)s.size() + 1 > cap) return -1;
    memcpy(out, s.c_str(), s.size() + 1);
    return (int)s.size();
  } catch (...) {
    return -1;
  }
}

// Canonical ranks of a parsed+sanitized molecule.  ranks must hold at least
// num_atoms ints.  Returns the atom count, or -1 on failure.
int ggpm_canon_ranks(const char* smiles, int break_ties, int* ranks, int cap) {
  try {
    Mol mol = parse_smiles(smiles);
    if (!sanitize_in_place(mol)) return -1;
    auto r = canonical_ranks(mol, break_ties != 0);
    if ((int)r.size() > cap) return -1;
    for (size_t i = 0; i < r.size(); i++) ranks[i] = r[i];
    return (int)r.size();
  } catch (...) {
    return -1;
  }
}

// Validity check: parse + sanitize.  1 = valid, 0 = invalid.
int ggpm_valid(const char* smiles) {
  try {
    Mol mol = parse_smiles(smiles);
    return sanitize_in_place(mol) ? 1 : 0;
  } catch (...) {
    return 0;
  }
}

}  // extern "C"
