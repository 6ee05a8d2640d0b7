// morpho_tools — fixture-builder driver around the UNMODIFIED reference
// (NameTag's bundled MorphoDiTa, MPL-2.0). Compiled by
// scripts/reference_parity.sh against the reference sources in /tmp/refbuild;
// used ONLY to generate parity fixtures (tiny generic morpho dictionaries,
// perceptron taggers, and golden tag/analyze outputs) that the Python reader
// in nametag_spark/morpho/morphodita.py is tested against.
//
// This is original driver code: it calls the reference's public encoder /
// trainer / runtime entry points the same way MorphoDiTa's own CLI tools do
// (encode_dictionary / train_tagger / run_tagger), but shares no code with
// them.
//
// Subcommands:
//   encode_dict  <max_suffix_len> <unk> <num> <punct> <sym> <out.dict>
//                [guesser.txt]                      < raw_dict.tsv
//   train_tagger <generic2|generic2_3|generic3|generic4> <dict_file>
//                <use_guesser 0|1> <templates_file> <iterations>
//                <out.tagger>                       < train.tsv
//   tag          <tagger_file>                      < vertical sentences
//   analyze      <tagger_file> <0|1 use_guesser>    < one form per line

#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <cstring>

#include "morphodita/derivator/derivation_formatter.h"
#include "morphodita/tokenizer/gru_tokenizer_trainer.h"
#include "morphodita/tokenizer/tokenizer_factory.h"
#include "unilib/utf8.h"
#include "utils/binary_decoder.h"
#include "utils/compressor.h"
#include "morphodita/derivator/derivator.h"
#include "morphodita/derivator/derivator_dictionary_encoder.h"
#include "morphodita/morpho/czech_morpho_encoder.h"
#include "morphodita/morpho/english_morpho_encoder.h"
#include "morphodita/morpho/generic_morpho_encoder.h"
#include "morphodita/morpho/morpho.h"
#include "morphodita/morpho/morpho_ids.h"
#include "morphodita/tagger/tagger.h"
#include "morphodita/tagger/tagger_ids.h"
#include "morphodita/tagger/conllu_elementary_features.h"
#include "morphodita/tagger/czech_elementary_features.h"
#include "morphodita/tagger/generic_elementary_features.h"
#include "morphodita/tagger/perceptron_tagger_trainer.h"
#include "morphodita/tagger/tagger_trainer.h"
#include "morphodita/tagger/training_maps.h"
#include "morphodita/tagset_converter/tagset_converter.h"

using namespace ufal::nametag::morphodita;
using ufal::nametag::utils::string_piece;
using namespace std;

static int usage() {
  cerr << "usage: morpho_tools encode_dict|train_tagger|tag|analyze ..." << endl;
  return 1;
}

int main(int argc, char* argv[]) {
  if (argc < 2) return usage();
  string cmd = argv[1];

  if (cmd == "encode_dict") {
    if (argc < 8) return usage();
    int max_suffix_len = stoi(argv[2]);
    generic_morpho_encoder::tags tags;
    tags.unknown_tag = argv[3];
    tags.number_tag = argv[4];
    tags.punctuation_tag = argv[5];
    tags.symbol_tag = argv[6];
    ofstream out(argv[7], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[7] << endl; return 1; }
    ifstream guesser;
    if (argc > 8) {
      guesser.open(argv[8]);
      if (!guesser) { cerr << "cannot open " << argv[8] << endl; return 1; }
    }
    out.put(morpho_ids::GENERIC);
    generic_morpho_encoder::encode(cin, max_suffix_len, tags, guesser, out);
    return 0;
  }

  if (cmd == "encode_dict_czech") {
    // encode_dict_czech <max_suffix_len> <max_tag_length> <out.dict>
    //                   [prefix_guesser.txt [stat_guesser.txt]] < raw_dict.tsv
    if (argc < 5) return usage();
    int max_suffix_len = stoi(argv[2]);
    int max_tag_length = stoi(argv[3]);
    ofstream out(argv[4], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[4] << endl; return 1; }
    ifstream prefix_guesser, stat_guesser;
    if (argc > 5 && argv[5][0]) {
      prefix_guesser.open(argv[5]);
      if (!prefix_guesser) { cerr << "cannot open " << argv[5] << endl; return 1; }
    }
    if (argc > 6 && argv[6][0]) {
      stat_guesser.open(argv[6]);
      if (!stat_guesser) { cerr << "cannot open " << argv[6] << endl; return 1; }
    }
    out.put(morpho_ids::CZECH);
    czech_morpho_encoder::encode(cin, max_suffix_len, prefix_guesser, stat_guesser,
                                 max_tag_length, out);
    return 0;
  }

  if (cmd == "train_tagger_conllu") {
    // train_tagger_conllu <conllu2|conllu2_3|conllu3> <dict> <use_guesser>
    //                     <templates> <iters> <out.tagger> < train.tsv
    if (argc < 8) return usage();
    tagger_id id;
    if (!tagger_ids::parse(argv[2], id)) { cerr << "bad tagger id" << endl; return 1; }
    ifstream dict(argv[3], ifstream::binary);
    if (!dict) { cerr << "cannot open " << argv[3] << endl; return 1; }
    bool use_guesser = stoi(argv[4]) != 0;
    ifstream templates(argv[5]);
    if (!templates) { cerr << "cannot open " << argv[5] << endl; return 1; }
    int iterations = stoi(argv[6]);
    ofstream out(argv[7], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[7] << endl; return 1; }
    ifstream no_heldout;
    out.put(id);
    tagger_trainer<perceptron_tagger_trainer<train_feature_sequences<conllu_elementary_features>>>::train(
        tagger_ids::decoding_order(id), tagger_ids::window_size(id), iterations,
        dict, use_guesser, templates, /*prune_features=*/false,
        cin, no_heldout, /*early_stopping=*/false, out);
    return 0;
  }

  if (cmd == "encode_dict_english") {
    // encode_dict_english <max_suffix_len> <out.dict> <guesser_file>
    //                     [negations_file]            < raw_dict.tsv
    if (argc < 5) return usage();
    int max_suffix_len = stoi(argv[2]);
    ofstream out(argv[3], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[3] << endl; return 1; }
    ifstream guesser(argv[4]);
    if (!guesser) { cerr << "cannot open " << argv[4] << endl; return 1; }
    ifstream negations;
    if (argc > 5 && argv[5][0]) {
      negations.open(argv[5]);
      if (!negations) { cerr << "cannot open " << argv[5] << endl; return 1; }
    }
    out.put(morpho_ids::ENGLISH_V3);
    english_morpho_encoder::encode(cin, max_suffix_len, guesser, negations, out);
    return 0;
  }

  if (cmd == "train_tagger_czech") {
    // train_tagger_czech <czech2|czech2_3|czech3> <dict> <use_guesser>
    //                    <templates> <iters> <out.tagger> < train.tsv
    if (argc < 8) return usage();
    tagger_id id;
    if (!tagger_ids::parse(argv[2], id)) { cerr << "bad tagger id" << endl; return 1; }
    ifstream dict(argv[3], ifstream::binary);
    if (!dict) { cerr << "cannot open " << argv[3] << endl; return 1; }
    bool use_guesser = stoi(argv[4]) != 0;
    ifstream templates(argv[5]);
    if (!templates) { cerr << "cannot open " << argv[5] << endl; return 1; }
    int iterations = stoi(argv[6]);
    ofstream out(argv[7], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[7] << endl; return 1; }
    ifstream no_heldout;
    out.put(id);
    tagger_trainer<perceptron_tagger_trainer<train_feature_sequences<czech_elementary_features>>>::train(
        tagger_ids::decoding_order(id), tagger_ids::window_size(id), iterations,
        dict, use_guesser, templates, /*prune_features=*/false,
        cin, no_heldout, /*early_stopping=*/false, out);
    return 0;
  }

  if (cmd == "train_tagger") {
    if (argc < 8) return usage();
    tagger_id id;
    if (!tagger_ids::parse(argv[2], id)) { cerr << "bad tagger id" << endl; return 1; }
    ifstream dict(argv[3], ifstream::binary);
    if (!dict) { cerr << "cannot open " << argv[3] << endl; return 1; }
    bool use_guesser = stoi(argv[4]) != 0;
    ifstream templates(argv[5]);
    if (!templates) { cerr << "cannot open " << argv[5] << endl; return 1; }
    int iterations = stoi(argv[6]);
    ofstream out(argv[7], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[7] << endl; return 1; }
    ifstream no_heldout;  // unopened -> evaluates false
    out.put(id);
    tagger_trainer<perceptron_tagger_trainer<train_feature_sequences<generic_elementary_features>>>::train(
        tagger_ids::decoding_order(id), tagger_ids::window_size(id), iterations,
        dict, use_guesser, templates, /*prune_features=*/false,
        cin, no_heldout, /*early_stopping=*/false, out);
    return 0;
  }

  if (cmd == "encode_derivator") {
    // encode_derivator <in.dict> <out.dict> < derinet.tsv
    //   (two tab-separated columns: lemma<TAB>parent, each optionally
    //    "lemma form" — derivator_dictionary_encoder.cpp input contract)
    if (argc < 4) return usage();
    ifstream dict(argv[2], ifstream::binary);
    if (!dict) { cerr << "cannot open " << argv[2] << endl; return 1; }
    ofstream out(argv[3], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[3] << endl; return 1; }
    derivator_dictionary_encoder::encode(cin, dict, /*verbose=*/false, out);
    return 0;
  }

  if (cmd == "derivator") {
    // derivator <dict-with-derinet> < lemmas, one per line
    // prints "<lemma>\tparent\t<parent-or-empty>" and
    //        "<lemma>\tchildren[\t<child>...]" per query
    if (argc < 3) return usage();
    unique_ptr<morpho> m(morpho::load(argv[2]));
    if (!m) { cerr << "cannot load morpho" << endl; return 1; }
    const derivator* der = m->get_derivator();
    if (!der) { cerr << "model has no derivator" << endl; return 1; }
    string line;
    derivated_lemma par;
    vector<derivated_lemma> kids;
    while (getline(cin, line)) {
      string_piece lemma(line.c_str(), line.size());
      cout << line << "\tparent\t";
      if (der->parent(lemma, par)) cout << par.lemma;
      cout << '\n' << line << "\tchildren";
      kids.clear();
      if (der->children(lemma, kids))
        for (auto&& k : kids) cout << '\t' << k.lemma;
      cout << '\n';
    }
    return 0;
  }

  if (cmd == "convert") {
    // convert <dict> <converter: none|identity|pdt_to_conll2009|
    //                 strip_lemma_id|strip_lemma_comment>
    //         <formatter: none|root|path|tree> <use_guesser 0|1> < forms
    // prints "form\tlemma\ttag" per output analysis, blank line per form —
    // golden generator for nametag_spark/morpho/convert.py
    if (argc < 6) return usage();
    unique_ptr<morpho> m(morpho::load(argv[2]));
    if (!m) { cerr << "cannot load morpho" << endl; return 1; }
    string conv_name = argv[3];
    unique_ptr<tagset_converter> conv;
    if (conv_name == "identity") conv.reset(tagset_converter::new_identity_converter());
    else if (conv_name != "none") {
      conv.reset(new_tagset_converter(conv_name, *m));
      if (!conv) { cerr << "bad converter " << conv_name << endl; return 1; }
    }
    unique_ptr<derivation_formatter> fmt(
        derivation_formatter::new_derivation_formatter(
            string_piece(argv[4], strlen(argv[4])), m->get_derivator()));
    if (!fmt) { cerr << "bad formatter " << argv[4] << endl; return 1; }
    auto mode = stoi(argv[5]) ? morpho::GUESSER : morpho::NO_GUESSER;
    string line;
    vector<tagged_lemma> lemmas;
    while (getline(cin, line)) {
      m->analyze(string_piece(line.c_str(), line.size()), mode, lemmas);
      fmt->format_tagged_lemmas(lemmas, conv.get());
      for (auto&& tl : lemmas)
        cout << line << '\t' << tl.lemma << '\t' << tl.tag << '\n';
      cout << '\n';
    }
    return 0;
  }

  if (cmd == "blob_probe") {
    // blob_probe <file> <skip> — run compressor::load on the blob at byte
    // offset <skip>; prints ok/fail (validates binary_writer framing)
    if (argc < 4) return usage();
    ifstream f(argv[2], ifstream::binary);
    if (!f) { cerr << "cannot open" << endl; return 1; }
    f.seekg(stoi(argv[3]));
    ufal::nametag::utils::binary_decoder data;
    bool ok = ufal::nametag::utils::compressor::load(f, data);
    cout << (ok ? "ok" : "fail") << endl;
    return ok ? 0 : 1;
  }

  if (cmd == "gru_train") {
    // gru_train <dim> <segment> <epochs> <batch> <lr> <lr_final> <dropout>
    //           <init_range> <allow_spaces 0|1> <out.tokenizer>
    //           < vertical sentences (token per line, blank line = sentence;
    //             sentence text = tokens joined with single spaces)
    if (argc < 12) return usage();
    unsigned dim = stoi(argv[2]), segment = stoi(argv[3]), epochs = stoi(argv[4]), batch = stoi(argv[5]);
    float lr = stof(argv[6]), lrF = stof(argv[7]), dropout = stof(argv[8]), init = stof(argv[9]);
    bool allow_spaces = stoi(argv[10]) != 0;
    ofstream out(argv[11], ofstream::binary);
    if (!out) { cerr << "cannot open " << argv[11] << endl; return 1; }
    vector<tokenized_sentence> data;
    tokenized_sentence ts;
    string line;
    auto flush_sentence = [&]() {
      if (!ts.sentence.empty()) { data.push_back(ts); ts.sentence.clear(); ts.tokens.clear(); }
    };
    while (getline(cin, line)) {
      if (line.empty()) { flush_sentence(); continue; }
      u32string tok;
      ufal::nametag::unilib::utf8::decode(line, tok);
      if (!ts.sentence.empty()) ts.sentence.push_back(U' ');
      ts.tokens.emplace_back(ts.sentence.size(), tok.size());
      ts.sentence.append(tok);
    }
    flush_sentence();
    string error;
    vector<tokenized_sentence> no_heldout;
    out.put(3);  // tokenizer_ids::GRU — the OUTER dispatch byte; the trainer
                 // then writes the gru factory version byte + blob
    if (!gru_tokenizer_trainer::train(gru_tokenizer_trainer::URL_EMAIL_LATEST, segment, allow_spaces,
                                      dim, epochs, batch, lr, lrF, dropout, init,
                                      /*early_stopping=*/false, data, no_heldout, out, error)) {
      cerr << "gru_train failed: " << error << endl;
      return 1;
    }
    return 0;
  }

  if (cmd == "gru_tokenize") {
    // gru_tokenize <file.tokenizer> < raw text -> vertical tokens
    if (argc < 3) return usage();
    unique_ptr<tokenizer_factory> f(tokenizer_factory::load(argv[2]));
    if (!f) { cerr << "cannot load tokenizer factory" << endl; return 1; }
    unique_ptr<tokenizer> t(f->new_tokenizer(nullptr));
    string text((istreambuf_iterator<char>(cin)), istreambuf_iterator<char>());
    t->set_text(text);
    vector<token_range> tokens;
    while (t->next_sentence(nullptr, &tokens)) {
      u32string utext;
      ufal::nametag::unilib::utf8::decode(text, utext);
      for (auto&& tok : tokens) {
        string enc8;
        ufal::nametag::unilib::utf8::encode(utext.substr(tok.start, tok.length), enc8);
        cout << enc8 << '\n';
      }
      cout << '\n';
    }
    return 0;
  }

  if (cmd == "generate") {
    // generate <dict> <converter|none> <use_guesser 0|1> < "lemma[\twildcard]" lines
    // prints "lemma\tstatus\tout_lemma\tform\ttag" per generated form (one
    // "lemma\tstatus" line when nothing generates), blank line per query —
    // golden generator for MdDictionary.generate + convert_generated
    if (argc < 5) return usage();
    unique_ptr<morpho> m(morpho::load(argv[2]));
    if (!m) { cerr << "cannot load morpho" << endl; return 1; }
    string conv_name = argv[3];
    unique_ptr<tagset_converter> conv;
    if (conv_name == "identity") conv.reset(tagset_converter::new_identity_converter());
    else if (conv_name != "none") {
      conv.reset(new_tagset_converter(conv_name, *m));
      if (!conv) { cerr << "bad converter " << conv_name << endl; return 1; }
    }
    auto mode = stoi(argv[4]) ? morpho::GUESSER : morpho::NO_GUESSER;
    string line;
    vector<tagged_lemma_forms> forms;
    while (getline(cin, line)) {
      string lemma = line, wildcard;
      auto tab = line.find('\t');
      if (tab != string::npos) { lemma = line.substr(0, tab); wildcard = line.substr(tab + 1); }
      int res = m->generate(string_piece(lemma.c_str(), lemma.size()),
                            wildcard.empty() ? nullptr : wildcard.c_str(), mode, forms);
      if (conv) conv->convert_generated(forms);
      bool any = false;
      for (auto&& lf : forms)
        for (auto&& tf : lf.forms) {
          cout << lemma << '\t' << res << '\t' << lf.lemma << '\t' << tf.form << '\t' << tf.tag << '\n';
          any = true;
        }
      if (!any) cout << lemma << '\t' << res << '\n';
      cout << '\n';
    }
    return 0;
  }

  if (cmd == "tag") {
    if (argc < 3) return usage();
    unique_ptr<tagger> t(tagger::load(argv[2]));
    if (!t) { cerr << "cannot load tagger" << endl; return 1; }
    string line;
    vector<string> words;
    vector<string_piece> forms;
    vector<tagged_lemma> tags;
    auto flush = [&]() {
      if (words.empty()) return;
      forms.clear();
      for (auto&& w : words) forms.emplace_back(w.c_str(), w.size());
      t->tag(forms, tags);
      for (size_t i = 0; i < words.size(); i++)
        cout << words[i] << '\t' << tags[i].lemma << '\t' << tags[i].tag << '\n';
      cout << '\n';
      words.clear();
    };
    while (getline(cin, line)) {
      if (line.empty()) flush();
      else words.push_back(line);
    }
    flush();
    return 0;
  }

  if (cmd == "analyze") {
    if (argc < 4) return usage();
    unique_ptr<tagger> t(tagger::load(argv[2]));
    if (!t) { cerr << "cannot load tagger" << endl; return 1; }
    const morpho* m = t->get_morpho();
    auto mode = stoi(argv[3]) ? morpho::GUESSER : morpho::NO_GUESSER;
    string line;
    vector<tagged_lemma> lemmas;
    while (getline(cin, line)) {
      int res = m->analyze(string_piece(line.c_str(), line.size()), mode, lemmas);
      for (auto&& tl : lemmas)
        cout << line << '\t' << tl.lemma << '\t' << tl.tag << '\t' << res << '\n';
      cout << '\n';
    }
    return 0;
  }

  return usage();
}
