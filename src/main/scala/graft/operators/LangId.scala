package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (real langid, replacing the
  * marker-word heuristic of `TextAnalysis.langId`).
  *
  * Method (public: Cavnar & Trenkle 1994 "N-Gram-Based Text
  * Categorization" / CLD-style byte-n-gram Naive Bayes):
  *
  *   1. Script detection first — CJK Han, Kana, Hangul and Cyrillic
  *      codepoint ratios decide zh/ja/ko/ru outright. This is what a
  *      marker-word heuristic provably cannot do (its markers are
  *      romanized and never appear in native-script text).
  *   2. For Latin-script text, score character trigrams of the
  *      normalized text against per-language log-probability profiles
  *      and take the argmax (Naive Bayes over trigrams).
  *
  * Engine-portability invariants (the oracle replays this in DuckDB):
  *   - All scores are INTEGER (scaled log-probs summed as longs) — no
  *     floating-point accumulation order to disagree on.
  *   - All ratio thresholds are integer cross-multiplications
  *     (`kana*20 >= len`), never double divisions.
  *   - Profiles are literals: computed once (deterministically, via
  *     StrictMath) from the seed corpus below, then embedded verbatim in
  *     both the Catalyst expression and the generated oracle SQL.
  *
  * 100 TB shape: map-only — normalization, regexp counts and the
  * trigram scan all fuse into the parquet scan; the profile table rides
  * along as task-local state (a few KB), never shuffled or joined.
  *
  * Reference behavior: pdf-brain has no language-ID stage (its corpora
  * are English markdown); this operator is part of the training-data
  * pipeline tier (CCNet's first stage is langid — Wenzek et al. 2019).
  */
object LangId {

  /** Languages decided by trigram profiles, in decision-priority order
    * (ties in score break toward the earlier code). Round 13 widened the
    * original 6 (de en es fr it pt) with cs da fi id nl no pl sv tr vi
    * (VERDICT r12 #4); round 15 adds ca et hr hu lt lv ro sk sl
    * (VERDICT r14 #5) — 25 trigram languages + the 7 script-decided
    * ones (ja zh ko ru ar hi th) = 32; round 16's per-script trigram
    * buckets (bg/sr/uk, fa/ur, mr/ne) brought 39; round 17's
    * single-language script buckets (el/he/bn first — VERDICT r16 #3 —
    * then ta/te/kn/ml/gu/pa/or/si/ka/hy/am/lo/km/my, see
    * [[SingleLangScripts]]) and the Bengali trigram bucket (bn→bn/as,
    * [[BengaliLangs]]) brought the servable set to 57; round 18
    * (VERDICT r17 #5) widens the Latin bucket with the major
    * Latin-script web languages af/az/eu/gl/ms/sq/sw (before this,
    * text in them labeled as a wrong near-neighbor — af→nl, az→tr,
    * gl→pt/es, ms→id — rather than unknown) and converts Ethiopic
    * from an am-collapse to an am/ti trigram bucket
    * ([[EthiopicLangs]]): 65 servable languages. Round 19 (VERDICT
    * r18 #3) widens Cyrillic with be/kk/ky/mk/mn/tg (the widened
    * normalization range, see [[NormRegexCyrJava]]), Arabic with
    * ps/ckb (ckb needs ە, see [[NormRegexArabJava]]), and Latin with
    * tl/uz/ceb/ha/yo (ha's hooked consonants and yo's combining tone
    * marks need the widened alphabet, see [[NormRegexJava]]):
    * 78 servable languages. Round 20 (VERDICT r19 #4) clears the
    * remaining wrong-near-neighbor tail: tt/ba/cv into the Cyrillic
    * bucket and ug/sd into the Arabic bucket (their discriminating
    * letters — Tatar/Bashkir ә/җ/ң/ҡ/ҙ/ҫ, Chuvash ӑ/ӗ/ҫ/ӳ, Uyghur
    * ۇ/ۆ/ۈ/ې/ڭ, Sindhi ٻ/ڄ/ڏ/ڳ/ڻ/ڪ — already sit inside the round-19
    * normalization ranges, so this is pure profile addition):
    * **83 servable languages**. Romanian
    * note: the seed uses the
    * cedilla forms ş/ţ (U+015F/U+0163, inside the normalization
    * alphabet); comma-below ș/ț (U+0219/U+021B, Latin Extended-B) fall
    * outside it and normalize to spaces — Romanian text in either
    * convention still scores on its other trigrams. Azerbaijani note:
    * its most frequent letter ə (U+0259) is WHY round 18 widened the
    * normalization alphabet by that one codepoint — without it every
    * "ə" collapsed to a space and az text was indistinguishable from
    * Turkish. */
  val TrigramLangs: Seq[String] = Seq(
    "af", "az", "ca", "ceb", "cs", "da", "de", "en", "es", "et", "eu",
    "fi", "fr", "gl", "ha", "hr", "hu", "id", "it", "lt", "lv", "ms",
    "nl", "no", "pl", "pt", "ro", "sk", "sl", "sq", "sv", "sw", "tl",
    "tr", "uz", "vi", "yo")

  /** Languages decided WITHIN the Cyrillic script bucket (round 16,
    * VERDICT r15 #6): when the Cyrillic codepoint ratio fires, the
    * text scores trigram profiles over the CYRILLIC-normalized text
    * instead of collapsing to 'ru' (which mislabeled uk/bg/sr — wrong
    * labels, not just missing ones). Round 19 (VERDICT r18 #3) widens
    * the bucket with be/kk/ky/mk/mn/tg — before this, the major
    * non-Slavic Cyrillic web languages labeled as a wrong
    * near-neighbor (kk/ky/mn→ru, mk→sr/bg, be→ru/uk) rather than
    * unknown. Round 20 (VERDICT r19 #4) adds tt/ba/cv — the last
    * Cyrillic web languages labeling as a wrong near-neighbor
    * (tt/ba→kk, cv→ru); their letters (ә җ ң һ ҡ ҙ ҫ ӑ ӗ ӳ) live in
    * the already-kept U+0460–04FF extension, so no normalization
    * change. Priority order for ties. */
  val CyrillicLangs: Seq[String] = Seq("ba", "be", "bg", "cv", "kk",
    "ky", "mk", "mn", "ru", "sr", "tg", "tt", "uk")

  /** Languages decided within the Arabic script bucket — same
    * mechanism (ar was the collapse label; fa/ur were unservable).
    * Round 19 adds ps (the Pashto retroflex letters ټ/ډ/ړ/ږ/ښ/ګ/ڼ
    * and ې/ۍ sit in the U+0679–06D3 extension the normalization
    * already keeps) and ckb (Sorani Kurdish — needs ە U+06D5 in the
    * normalization; ڕ/ڵ/ۆ/ێ are in the extension block). Round 20
    * (VERDICT r19 #4) adds ug (Uyghur — fully vowelled Arabic script,
    * ۇ/ۆ/ۈ/ې/ۋ/ڭ all in the extension) and sd (Sindhi — the implosive
    * letters ٻ/ڄ/ڏ/ڳ and ڙ/ڻ/ڪ likewise; its ۽ 'and'-sign U+06FD sits
    * OUTSIDE the kept ranges and collapses to a space, which only
    * drops a standalone conjunction word). */
  val ArabicLangs: Seq[String] =
    Seq("ar", "ckb", "fa", "ps", "sd", "ug", "ur")

  /** Languages decided within the Devanagari bucket — hi was the
    * collapse label; mr/ne were unservable. */
  val DevanagariLangs: Seq[String] = Seq("hi", "mr", "ne")

  /** Languages decided within the Bengali-script bucket (round 17,
    * the VERDICT r16 "as/or later" path): the block carries Bengali
    * AND Assamese — bn was the collapse label; as was unservable.
    * Assamese's ৰ/ৱ (U+09F0/09F1) sit inside the normalization
    * alphabet, so its trigrams are sharply distinctive. (Odia is NOT
    * here — it has its own block, served by [[SingleLangScripts]].) */
  val BengaliLangs: Seq[String] = Seq("as", "bn")

  /** Languages decided within the Ethiopic-script bucket (round 18,
    * VERDICT r17 #5): the block carries Amharic AND Tigrinya — am was
    * the round-17 collapse label; ti was unservable. Tigrinya's
    * function words (እዩ/ኣብ/ናብ/ከምኡውን and the ቕ/ኽ series) separate
    * sharply from Amharic's (ነው/ውስጥ/እና) in trigram space. */
  val EthiopicLangs: Seq[String] = Seq("am", "ti")

  /** The per-script language lists, keyed by the script bucket name. */
  val ScriptLangs: Map[String, Seq[String]] = Map(
    "latin" -> TrigramLangs, "cyr" -> CyrillicLangs,
    "arab" -> ArabicLangs, "deva" -> DevanagariLangs,
    "beng" -> BengaliLangs, "ethi" -> EthiopicLangs)

  /** SINGLE-LANGUAGE script buckets, in decision order: scripts whose
    * codepoint ratio alone decides the label (each block carries one
    * servable web language; no trigram profile needed). Round 17
    * widened the r16 set (el/he/bn/th) with the remaining major
    * single-language blocks — before this, text in any of these
    * scripts normalized to nothing in every trigram bucket and exited
    * via the Latin zero-trigram prior as 'en', a WRONG label (the
    * class VERDICT r15/r16 flagged for Cyrillic/Greek). The Bengali
    * and Ethiopic blocks are NOT here: each carries TWO languages
    * (bn/as, am/ti), so they route into their own trigram buckets
    * ([[BengaliLangs]], [[EthiopicLangs]] — the latter cleared round
    * 17's documented Ethiopic→am collapse); Odia has its own block
    * and stays. */
  val SingleLangScripts: Seq[(String, String)] = Seq(
    "greek" -> "el", "hebr" -> "he", "thai" -> "th",
    "taml" -> "ta", "telu" -> "te", "knda" -> "kn", "mlym" -> "ml",
    "gujr" -> "gu", "guru" -> "pa", "orya" -> "or", "sinh" -> "si",
    "geor" -> "ka", "armn" -> "hy", "laoo" -> "lo",
    "khmr" -> "km", "mymr" -> "my")

  /** Penalty (scaled log-prob) for a trigram absent from a language's
    * profile. More negative than any real profile weight. */
  val Penalty: Long = -1000L

  /** Top-K trigrams kept per language profile. */
  val ProfileK: Int = 200

  /** Seed corpus per language — authored for this engine (generic
    * encyclopedic register, no source text). Profiles derive from these
    * deterministically, so the model is reproducible from the repo. */
  val Seeds: Map[String, String] = Map(
    "de" -> """Die Geschichte der Wissenschaft zeigt, dass neue Ideen oft auf
      Widerstand stoßen. Forscher entwickeln Methoden, um die Welt besser zu
      verstehen. Das Wetter in den Bergen kann sich schnell ändern, und die
      Wanderer müssen vorsichtig sein. Viele Menschen leben in großen Städten
      und arbeiten in Büros oder Fabriken. Die Kinder gehen jeden Morgen zur
      Schule und lernen lesen, schreiben und rechnen. Eine gesunde Ernährung
      mit Obst und Gemüse ist wichtig für den Körper. Der Zug fährt pünktlich
      vom Bahnhof ab und erreicht die Stadt am Abend. Im Sommer fahren die
      Familien ans Meer oder in die Berge, um sich zu erholen. Die Regierung
      hat ein neues Gesetz über den Schutz der Umwelt beschlossen. Musik und
      Kunst spielen eine wichtige Rolle im Leben vieler Menschen. Wir haben
      gestern einen langen Brief an unsere Freunde geschrieben. Das Buch
      liegt auf dem Tisch neben dem Fenster und wartet auf seinen Leser.""",
    "en" -> """The history of science shows that new ideas often meet with
      resistance before they are accepted. Researchers develop methods to
      understand the world around us in greater detail. The weather in the
      mountains can change quickly, and hikers should always be careful.
      Many people live in large cities and work in offices or factories.
      Children go to school every morning to learn reading, writing and
      mathematics. A healthy diet with fruit and vegetables is important
      for the body and the mind. The train leaves the station on time and
      reaches the city in the evening. In summer, families travel to the
      sea or to the mountains to rest and recover. The government has
      passed a new law about the protection of the environment. Music and
      art play an important role in the lives of many people. We wrote a
      long letter to our friends yesterday about the journey. The book
      lies on the table next to the window, waiting for its reader.""",
    "es" -> """La historia de la ciencia muestra que las nuevas ideas a
      menudo encuentran resistencia antes de ser aceptadas. Los
      investigadores desarrollan métodos para comprender mejor el mundo
      que nos rodea. El tiempo en las montañas puede cambiar rápidamente y
      los excursionistas deben tener cuidado. Muchas personas viven en
      grandes ciudades y trabajan en oficinas o fábricas. Los niños van a
      la escuela cada mañana para aprender a leer, escribir y calcular.
      Una alimentación sana con frutas y verduras es importante para el
      cuerpo. El tren sale de la estación a tiempo y llega a la ciudad por
      la noche. En verano las familias viajan al mar o a la montaña para
      descansar. El gobierno ha aprobado una nueva ley sobre la protección
      del medio ambiente. La música y el arte desempeñan un papel
      importante en la vida de muchas personas. Ayer escribimos una carta
      larga a nuestros amigos sobre el viaje. El libro está sobre la mesa
      junto a la ventana, esperando a su lector.""",
    "fr" -> """L'histoire des sciences montre que les idées nouvelles
      rencontrent souvent de la résistance avant d'être acceptées. Les
      chercheurs développent des méthodes pour mieux comprendre le monde
      qui nous entoure. Le temps en montagne peut changer rapidement et
      les randonneurs doivent être prudents. Beaucoup de gens vivent dans
      de grandes villes et travaillent dans des bureaux ou des usines. Les
      enfants vont à l'école chaque matin pour apprendre à lire, à écrire
      et à compter. Une alimentation saine avec des fruits et des légumes
      est importante pour le corps. Le train part de la gare à l'heure et
      arrive en ville dans la soirée. En été, les familles partent à la
      mer ou à la montagne pour se reposer. Le gouvernement a adopté une
      nouvelle loi sur la protection de l'environnement. La musique et
      l'art jouent un rôle important dans la vie de nombreuses personnes.
      Hier, nous avons écrit une longue lettre à nos amis au sujet du
      voyage. Le livre est posé sur la table près de la fenêtre et attend
      son lecteur.""",
    "it" -> """La storia della scienza mostra che le nuove idee incontrano
      spesso resistenza prima di essere accettate. I ricercatori
      sviluppano metodi per comprendere meglio il mondo che ci circonda.
      Il tempo in montagna può cambiare rapidamente e gli escursionisti
      devono fare attenzione. Molte persone vivono nelle grandi città e
      lavorano negli uffici o nelle fabbriche. I bambini vanno a scuola
      ogni mattina per imparare a leggere, a scrivere e a contare. Una
      alimentazione sana con frutta e verdura è importante per il corpo.
      Il treno parte dalla stazione in orario e arriva in città la sera.
      In estate le famiglie vanno al mare o in montagna per riposarsi. Il
      governo ha approvato una nuova legge sulla protezione dell'ambiente.
      La musica e l'arte svolgono un ruolo importante nella vita di molte
      persone. Ieri abbiamo scritto una lunga lettera ai nostri amici sul
      viaggio. Il libro è sul tavolo accanto alla finestra e aspetta il
      suo lettore.""",
    "pt" -> """A história da ciência mostra que as novas ideias encontram
      muitas vezes resistência antes de serem aceites. Os investigadores
      desenvolvem métodos para compreender melhor o mundo que nos rodeia.
      O tempo nas montanhas pode mudar rapidamente e os caminhantes devem
      ter cuidado. Muitas pessoas vivem em grandes cidades e trabalham em
      escritórios ou fábricas. As crianças vão à escola todas as manhãs
      para aprender a ler, a escrever e a contar. Uma alimentação saudável
      com frutas e legumes é importante para o corpo. O comboio parte da
      estação a horas e chega à cidade ao fim da tarde. No verão as
      famílias viajam para o mar ou para a montanha para descansar. O
      governo aprovou uma nova lei sobre a proteção do meio ambiente. A
      música e a arte desempenham um papel importante na vida de muitas
      pessoas. Ontem escrevemos uma longa carta aos nossos amigos sobre a
      viagem. O livro está sobre a mesa ao lado da janela, à espera do
      seu leitor.""",
    "nl" -> """De geschiedenis van de wetenschap laat zien dat nieuwe ideeën
      vaak op weerstand stuiten voordat ze worden aanvaard. Onderzoekers
      ontwikkelen methoden om de wereld om ons heen beter te begrijpen.
      Het weer in de bergen kan snel veranderen en wandelaars moeten
      voorzichtig zijn. Veel mensen wonen in grote steden en werken op
      kantoren of in fabrieken. De kinderen gaan elke ochtend naar school
      om te leren lezen, schrijven en rekenen. Gezonde voeding met fruit
      en groenten is belangrijk voor het lichaam. De trein vertrekt op
      tijd van het station en bereikt de stad in de avond. In de zomer
      reizen gezinnen naar zee of naar de bergen om uit te rusten. De
      regering heeft een nieuwe wet over de bescherming van het milieu
      aangenomen. Muziek en kunst spelen een belangrijke rol in het leven
      van veel mensen. Wij hebben gisteren een lange brief aan onze
      vrienden geschreven over de reis. Het boek ligt op de tafel naast
      het raam te wachten op zijn lezer.""",
    "sv" -> """Vetenskapens historia visar att nya idéer ofta möter motstånd
      innan de accepteras. Forskare utvecklar metoder för att bättre
      förstå världen omkring oss. Vädret i bergen kan förändras snabbt
      och vandrare måste vara försiktiga. Många människor bor i stora
      städer och arbetar på kontor eller i fabriker. Barnen går till
      skolan varje morgon för att lära sig läsa, skriva och räkna. En
      hälsosam kost med frukt och grönsaker är viktig för kroppen. Tåget
      avgår i tid från stationen och når staden på kvällen. På sommaren
      reser familjerna till havet eller till bergen för att vila.
      Regeringen har antagit en ny lag om skydd av miljön. Musik och
      konst spelar en viktig roll i många människors liv. Vi skrev i går
      ett långt brev till våra vänner om resan. Boken ligger på bordet
      bredvid fönstret och väntar på sin läsare.""",
    "da" -> """Videnskabens historie viser at nye idéer ofte møder modstand
      før de bliver accepteret. Forskere udvikler metoder til bedre at
      forstå verden omkring os. Vejret i bjergene kan ændre sig hurtigt
      og vandrere skal være forsigtige. Mange mennesker bor i store byer
      og arbejder på kontorer eller i fabrikker. Børnene går i skole hver
      morgen for at lære at læse, skrive og regne. En sund kost med frugt
      og grøntsager er vigtig for kroppen. Toget kører til tiden fra
      stationen og når byen om aftenen. Om sommeren rejser familierne til
      havet eller til bjergene for at hvile sig. Regeringen har vedtaget
      en ny lov om beskyttelse af miljøet. Musik og kunst spiller en
      vigtig rolle i mange menneskers liv. Vi skrev i går et langt brev
      til vores venner om rejsen. Bogen ligger på bordet ved siden af
      vinduet og venter på sin læser.""",
    "no" -> """Vitenskapens historie viser at nye ideer ofte møter motstand
      før de blir akseptert. Forskere utvikler metoder for å forstå
      verden rundt oss bedre. Været i fjellet kan endre seg raskt og
      turgåere må være forsiktige. Mange mennesker bor i store byer og
      arbeider på kontorer eller i fabrikker. Barna går på skolen hver
      morgen for å lære å lese, skrive og regne. Et sunt kosthold med
      frukt og grønnsaker er viktig for kroppen. Toget går i rute fra
      stasjonen og når byen om kvelden. Om sommeren reiser familiene til
      sjøen eller til fjells for å hvile. Regjeringen har vedtatt en ny
      lov om vern av miljøet. Musikk og kunst spiller en viktig rolle i
      livet til mange mennesker. Vi skrev i går et langt brev til vennene
      våre om reisen. Boken ligger på bordet ved siden av vinduet og
      venter på sin leser.""",
    "fi" -> """Tieteen historia osoittaa että uudet ajatukset kohtaavat
      usein vastustusta ennen kuin ne hyväksytään. Tutkijat kehittävät
      menetelmiä ymmärtääkseen maailmaa paremmin. Sää vuoristossa voi
      muuttua nopeasti ja vaeltajien on oltava varovaisia. Monet ihmiset
      asuvat suurissa kaupungeissa ja työskentelevät toimistoissa tai
      tehtaissa. Lapset menevät kouluun joka aamu oppiakseen lukemaan,
      kirjoittamaan ja laskemaan. Terveellinen ruokavalio hedelmineen ja
      vihanneksineen on tärkeä keholle. Juna lähtee asemalta ajallaan ja
      saapuu kaupunkiin illalla. Kesällä perheet matkustavat merelle tai
      vuorille lepäämään. Hallitus on hyväksynyt uuden lain ympäristön
      suojelusta. Musiikki ja taide ovat tärkeässä asemassa monien
      ihmisten elämässä. Kirjoitimme eilen pitkän kirjeen ystävillemme
      matkasta. Kirja on pöydällä ikkunan vieressä odottamassa
      lukijaansa.""",
    "pl" -> """Historia nauki pokazuje że nowe pomysły często napotykają
      opór zanim zostaną przyjęte. Badacze opracowują metody aby lepiej
      zrozumieć otaczający nas świat. Pogoda w górach może się szybko
      zmieniać a wędrowcy muszą być ostrożni. Wielu ludzi mieszka w
      dużych miastach i pracuje w biurach lub fabrykach. Dzieci chodzą do
      szkoły każdego ranka aby nauczyć się czytać, pisać i liczyć.
      Zdrowa dieta z owocami i warzywami jest ważna dla organizmu.
      Pociąg odjeżdża ze stacji punktualnie i dociera do miasta
      wieczorem. Latem rodziny jeżdżą nad morze albo w góry żeby
      odpocząć. Rząd przyjął nową ustawę o ochronie środowiska. Muzyka i
      sztuka odgrywają ważną rolę w życiu wielu ludzi. Wczoraj
      napisaliśmy długi list do naszych przyjaciół o podróży. Książka
      leży na stole obok okna i czeka na swojego czytelnika.""",
    "cs" -> """Dějiny vědy ukazují že nové myšlenky často narážejí na odpor
      než jsou přijaty. Vědci vyvíjejí metody aby lépe porozuměli světu
      kolem nás. Počasí na horách se může rychle změnit a turisté musí
      být opatrní. Mnoho lidí žije ve velkých městech a pracuje v
      kancelářích nebo továrnách. Děti chodí každé ráno do školy aby se
      naučily číst, psát a počítat. Zdravá strava s ovocem a zeleninou je
      důležitá pro tělo. Vlak odjíždí ze stanice včas a do města dorazí
      večer. V létě jezdí rodiny k moři nebo na hory aby si odpočinuly.
      Vláda přijala nový zákon o ochraně životního prostředí. Hudba a
      umění hrají důležitou roli v životě mnoha lidí. Včera jsme napsali
      dlouhý dopis našim přátelům o cestě. Kniha leží na stole vedle okna
      a čeká na svého čtenáře.""",
    "tr" -> """Bilim tarihi yeni fikirlerin kabul edilmeden önce sık sık
      dirençle karşılaştığını gösterir. Araştırmacılar çevremizdeki
      dünyayı daha iyi anlamak için yöntemler geliştirir. Dağlarda hava
      hızla değişebilir ve yürüyüşçüler dikkatli olmalıdır. Birçok insan
      büyük şehirlerde yaşar ve ofislerde veya fabrikalarda çalışır.
      Çocuklar okumayı, yazmayı ve saymayı öğrenmek için her sabah okula
      gider. Meyve ve sebze içeren sağlıklı beslenme vücut için
      önemlidir. Tren istasyondan zamanında kalkar ve akşam şehre ulaşır.
      Yazın aileler dinlenmek için denize veya dağlara gider. Hükümet
      çevrenin korunması hakkında yeni bir yasa kabul etti. Müzik ve
      sanat birçok insanın hayatında önemli bir rol oynar. Dün
      arkadaşlarımıza yolculuk hakkında uzun bir mektup yazdık. Kitap
      pencerenin yanındaki masanın üzerinde okuyucusunu bekliyor.""",
    "id" -> """Sejarah ilmu pengetahuan menunjukkan bahwa gagasan baru
      sering menghadapi penolakan sebelum diterima. Para peneliti
      mengembangkan metode untuk memahami dunia di sekitar kita dengan
      lebih baik. Cuaca di pegunungan dapat berubah dengan cepat dan para
      pendaki harus berhati-hati. Banyak orang tinggal di kota besar dan
      bekerja di kantor atau pabrik. Anak-anak pergi ke sekolah setiap
      pagi untuk belajar membaca, menulis dan berhitung. Makanan sehat
      dengan buah dan sayuran penting bagi tubuh. Kereta berangkat dari
      stasiun tepat waktu dan tiba di kota pada malam hari. Pada musim
      panas keluarga pergi ke laut atau ke gunung untuk beristirahat.
      Pemerintah telah mengesahkan undang-undang baru tentang
      perlindungan lingkungan. Musik dan seni memainkan peran penting
      dalam kehidupan banyak orang. Kemarin kami menulis surat panjang
      kepada teman-teman kami tentang perjalanan. Buku itu tergeletak di
      atas meja di samping jendela menunggu pembacanya.""",
    "vi" -> """Lịch sử khoa học cho thấy những ý tưởng mới thường gặp phải
      sự phản đối trước khi được chấp nhận. Các nhà nghiên cứu phát
      triển phương pháp để hiểu rõ hơn về thế giới xung quanh chúng ta.
      Thời tiết trên núi có thể thay đổi nhanh chóng và người đi bộ phải
      cẩn thận. Nhiều người sống ở các thành phố lớn và làm việc trong
      văn phòng hoặc nhà máy. Trẻ em đến trường mỗi sáng để học đọc, học
      viết và học tính. Chế độ ăn lành mạnh với trái cây và rau quả rất
      quan trọng cho cơ thể. Đoàn tàu rời nhà ga đúng giờ và đến thành
      phố vào buổi tối. Vào mùa hè các gia đình đi biển hoặc lên núi để
      nghỉ ngơi. Chính phủ đã thông qua một đạo luật mới về bảo vệ môi
      trường. Âm nhạc và nghệ thuật đóng vai trò quan trọng trong đời
      sống của nhiều người. Hôm qua chúng tôi đã viết một lá thư dài cho
      bạn bè về chuyến đi. Cuốn sách nằm trên bàn cạnh cửa sổ chờ đợi
      người đọc của nó.""",
    "hu" -> """A tudomány története azt mutatja, hogy az új gondolatok
      gyakran ellenállásba ütköznek, mielőtt elfogadják őket. A kutatók
      módszereket dolgoznak ki, hogy jobban megértsék a körülöttünk lévő
      világot. A hegyekben az időjárás gyorsan változhat, és a
      túrázóknak óvatosnak kell lenniük. Sok ember nagy városokban él,
      és irodákban vagy gyárakban dolgozik. A gyerekek minden reggel
      iskolába mennek, hogy olvasni, írni és számolni tanuljanak. Az
      egészséges táplálkozás gyümölccsel és zöldséggel fontos a test
      számára. A vonat időben indul az állomásról, és este érkezik a
      városba. Nyáron a családok a tengerhez vagy a hegyekbe utaznak
      pihenni. A kormány új törvényt fogadott el a környezet védelméről.
      A zene és a művészet fontos szerepet játszik sok ember életében.
      Tegnap hosszú levelet írtunk barátainknak az utazásról. A könyv az
      asztalon fekszik az ablak mellett, és olvasójára vár.""",
    "ro" -> """Istoria ştiinţei arată că ideile noi întâmpină adesea
      rezistenţă înainte de a fi acceptate. Cercetătorii dezvoltă metode
      pentru a înţelege mai bine lumea din jurul nostru. Vremea la munte
      se poate schimba repede, iar drumeţii trebuie să fie atenţi. Mulţi
      oameni trăiesc în oraşe mari şi lucrează în birouri sau fabrici.
      Copiii merg la şcoală în fiecare dimineaţă pentru a învăţa să
      citească, să scrie şi să socotească. O alimentaţie sănătoasă cu
      fructe şi legume este importantă pentru corp. Trenul pleacă din
      gară la timp şi ajunge în oraş seara. Vara familiile merg la mare
      sau la munte pentru a se odihni. Guvernul a adoptat o lege nouă
      privind protecţia mediului. Muzica şi arta joacă un rol important
      în viaţa multor oameni. Ieri am scris o scrisoare lungă
      prietenilor noştri despre călătorie. Cartea stă pe masă lângă
      fereastră şi îşi aşteaptă cititorul.""",
    "sk" -> """Dejiny vedy ukazujú, že nové myšlienky často narážajú na
      odpor, kým sú prijaté. Výskumníci vyvíjajú metódy, aby lepšie
      porozumeli svetu okolo nás. Počasie na horách sa môže rýchlo
      zmeniť a turisti musia byť opatrní. Mnoho ľudí žije vo veľkých
      mestách a pracuje v kanceláriách alebo továrňach. Deti chodia
      každé ráno do školy, aby sa naučili čítať, písať a počítať.
      Zdravá strava s ovocím a zeleninou je dôležitá pre telo. Vlak
      odchádza zo stanice načas a do mesta prichádza večer. V lete
      cestujú rodiny k moru alebo na hory, aby si oddýchli. Vláda
      prijala nový zákon o ochrane životného prostredia. Hudba a umenie
      hrajú dôležitú úlohu v živote mnohých ľudí. Včera sme napísali
      dlhý list našim priateľom o ceste. Kniha leží na stole vedľa okna
      a čaká na svojho čitateľa.""",
    "sl" -> """Zgodovina znanosti kaže, da nove zamisli pogosto naletijo
      na odpor, preden so sprejete. Raziskovalci razvijajo metode, da bi
      bolje razumeli svet okoli nas. Vreme v gorah se lahko hitro
      spremeni in pohodniki morajo biti previdni. Veliko ljudi živi v
      velikih mestih in dela v pisarnah ali tovarnah. Otroci gredo vsako
      jutro v šolo, da se naučijo brati, pisati in računati. Zdrava
      prehrana s sadjem in zelenjavo je pomembna za telo. Vlak odpelje s
      postaje pravočasno in zvečer prispe v mesto. Poleti se družine
      odpravijo na morje ali v gore, da si odpočijejo. Vlada je sprejela
      nov zakon o varstvu okolja. Glasba in umetnost igrata pomembno
      vlogo v življenju mnogih ljudi. Včeraj smo prijateljem napisali
      dolgo pismo o potovanju. Knjiga leži na mizi ob oknu in čaka
      svojega bralca.""",
    "hr" -> """Povijest znanosti pokazuje da nove ideje često nailaze na
      otpor prije nego što budu prihvaćene. Istraživači razvijaju metode
      kako bi bolje razumjeli svijet oko nas. Vrijeme u planinama može
      se brzo promijeniti i planinari moraju biti oprezni. Mnogi ljudi
      žive u velikim gradovima i rade u uredima ili tvornicama. Djeca
      svako jutro idu u školu kako bi naučila čitati, pisati i računati.
      Zdrava prehrana s voćem i povrćem važna je za tijelo. Vlak polazi
      s kolodvora na vrijeme i navečer stiže u grad. Ljeti obitelji
      putuju na more ili u planine kako bi se odmorile. Vlada je
      donijela novi zakon o zaštiti okoliša. Glazba i umjetnost igraju
      važnu ulogu u životu mnogih ljudi. Jučer smo prijateljima napisali
      dugo pismo o putovanju. Knjiga leži na stolu pokraj prozora i čeka
      svog čitatelja.""",
    "et" -> """Teaduse ajalugu näitab, et uued ideed kohtavad sageli
      vastupanu, enne kui need omaks võetakse. Teadlased arendavad
      meetodeid, et paremini mõista meid ümbritsevat maailma. Ilm
      mägedes võib kiiresti muutuda ja matkajad peavad olema
      ettevaatlikud. Paljud inimesed elavad suurtes linnades ja töötavad
      kontorites või tehastes. Lapsed lähevad igal hommikul kooli, et
      õppida lugema, kirjutama ja arvutama. Tervislik toit puu- ja
      köögiviljadega on keha jaoks oluline. Rong väljub jaamast õigel
      ajal ja jõuab linna õhtul. Suvel sõidavad pered mere äärde või
      mägedesse puhkama. Valitsus võttis vastu uue seaduse keskkonna
      kaitse kohta. Muusika ja kunst mängivad paljude inimeste elus
      olulist rolli. Eile kirjutasime sõpradele pika kirja reisist.
      Raamat lebab laual akna kõrval ja ootab oma lugejat.""",
    "lt" -> """Mokslo istorija rodo, kad naujos idėjos dažnai sutinka
      pasipriešinimą, kol yra priimamos. Tyrėjai kuria metodus, kad
      geriau suprastų mus supantį pasaulį. Oras kalnuose gali greitai
      pasikeisti, ir žygeiviai turi būti atsargūs. Daug žmonių gyvena
      dideliuose miestuose ir dirba biuruose arba gamyklose. Vaikai
      kiekvieną rytą eina į mokyklą mokytis skaityti, rašyti ir
      skaičiuoti. Sveika mityba su vaisiais ir daržovėmis yra svarbi
      kūnui. Traukinys išvyksta iš stoties laiku ir vakare pasiekia
      miestą. Vasarą šeimos vyksta prie jūros arba į kalnus pailsėti.
      Vyriausybė priėmė naują įstatymą dėl aplinkos apsaugos. Muzika ir
      menas vaidina svarbų vaidmenį daugelio žmonių gyvenime. Vakar
      draugams parašėme ilgą laišką apie kelionę. Knyga guli ant stalo
      prie lango ir laukia savo skaitytojo.""",
    "lv" -> """Zinātnes vēsture rāda, ka jaunas idejas bieži sastopas ar
      pretestību, pirms tās tiek pieņemtas. Pētnieki izstrādā metodes,
      lai labāk izprastu pasauli mums apkārt. Laiks kalnos var ātri
      mainīties, un pārgājiena dalībniekiem jābūt uzmanīgiem. Daudzi
      cilvēki dzīvo lielās pilsētās un strādā birojos vai rūpnīcās.
      Bērni katru rītu iet uz skolu, lai mācītos lasīt, rakstīt un
      rēķināt. Veselīgs uzturs ar augļiem un dārzeņiem ir svarīgs
      ķermenim. Vilciens atiet no stacijas laikā un vakarā sasniedz
      pilsētu. Vasarā ģimenes dodas uz jūru vai kalniem atpūsties.
      Valdība pieņēma jaunu likumu par vides aizsardzību. Mūzika un
      māksla spēlē svarīgu lomu daudzu cilvēku dzīvē. Vakar draugiem
      uzrakstījām garu vēstuli par ceļojumu. Grāmata guļ uz galda pie
      loga un gaida savu lasītāju.""",
    "ca" -> """La història de la ciència mostra que les idees noves
      sovint troben resistència abans de ser acceptades. Els
      investigadors desenvolupen mètodes per entendre millor el món que
      ens envolta. El temps a les muntanyes pot canviar ràpidament i els
      excursionistes han d'anar amb compte. Molta gent viu a les grans
      ciutats i treballa en oficines o fàbriques. Els nens van a
      l'escola cada matí per aprendre a llegir, escriure i comptar. Una
      alimentació sana amb fruita i verdura és important per al cos. El
      tren surt de l'estació puntualment i arriba a la ciutat al vespre.
      A l'estiu les famílies viatgen al mar o a la muntanya per
      descansar. El govern ha aprovat una nova llei sobre la protecció
      del medi ambient. La música i l'art tenen un paper important en la
      vida de molta gent. Ahir vam escriure una carta llarga als nostres
      amics sobre el viatge. El llibre és sobre la taula al costat de la
      finestra i espera el seu lector.""",
    // --- round-18 Latin additions (VERDICT r17 #5): af az eu gl ms
    // sq sw — the major Latin-script web languages that previously
    // labeled as a wrong near-neighbor (af→nl, az→tr, gl→pt, ms→id) ---
    "af" -> """Die geskiedenis van die wetenskap wys dat nuwe idees
      dikwels weerstand kry voordat hulle aanvaar word. Navorsers
      ontwikkel metodes om die wêreld om ons beter te verstaan. Die weer
      in die berge kan vinnig verander en stappers moet versigtig wees.
      Baie mense woon in groot stede en werk in kantore of fabrieke. Die
      kinders gaan elke oggend skool toe om te leer lees, skryf en
      reken. Gesonde kos met vrugte en groente is belangrik vir die
      liggaam. Die trein vertrek betyds van die stasie en bereik die
      stad in die aand. In die somer reis gesinne na die see of na die
      berge om te rus. Die regering het 'n nuwe wet oor die beskerming
      van die omgewing aanvaar. Musiek en kuns speel 'n belangrike rol
      in die lewens van baie mense. Ons het gister 'n lang brief aan ons
      vriende geskryf oor die reis. Die boek lê op die tafel langs die
      venster en wag vir sy leser.""",
    "az" -> """Elmin tarixi göstərir ki, yeni fikirlər qəbul edilməzdən
      əvvəl tez-tez müqavimətlə qarşılaşır. Tədqiqatçılar ətrafımızdakı
      dünyanı daha yaxşı anlamaq üçün üsullar hazırlayırlar. Dağlarda
      hava tez dəyişə bilər və səyahətçilər ehtiyatlı olmalıdırlar. Bir
      çox insan böyük şəhərlərdə yaşayır və idarələrdə yaxud
      zavodlarda işləyir. Uşaqlar oxumağı, yazmağı və saymağı öyrənmək
      üçün hər səhər məktəbə gedirlər. Meyvə və tərəvəzlə sağlam
      qidalanma bədən üçün vacibdir. Qatar stansiyadan vaxtında yola
      düşür və axşam şəhərə çatır. Yayda ailələr dincəlmək üçün dənizə
      və ya dağlara gedirlər. Hökumət ətraf mühitin qorunması haqqında
      yeni qanun qəbul etmişdir. Musiqi və incəsənət bir çox insanın
      həyatında mühüm rol oynayır. Dünən dostlarımıza səyahət haqqında
      uzun məktub yazdıq. Kitab pəncərənin yanındakı masanın üstündə
      oxucusunu gözləyir.""",
    "eu" -> """Zientziaren historiak erakusten du ideia berriek askotan
      erresistentzia aurkitzen dutela onartuak izan baino lehen.
      Ikertzaileek metodoak garatzen dituzte inguratzen gaituen mundua
      hobeto ulertzeko. Mendietako eguraldia azkar alda daiteke eta
      mendizaleek kontuz ibili behar dute. Jende asko hiri handietan
      bizi da eta bulegoetan edo lantegietan egiten du lan. Haurrak
      goizero eskolara joaten dira irakurtzen, idazten eta zenbatzen
      ikastera. Fruta eta barazkiekin osatutako elikadura osasuntsua
      garrantzitsua da gorputzarentzat. Trena garaiz ateratzen da
      geltokitik eta arratsaldean iristen da hirira. Udan familiak
      itsasora edo mendietara joaten dira atseden hartzera. Gobernuak
      ingurumenaren babesari buruzko lege berria onartu du. Musikak eta
      arteak zeregin garrantzitsua dute jende askoren bizitzan. Atzo
      gutun luzea idatzi genien gure lagunei bidaiari buruz. Liburua
      mahai gainean dago leihoaren ondoan, irakurlearen zain.""",
    "gl" -> """A historia da ciencia amosa que as ideas novas atopan
      moitas veces resistencia antes de seren aceptadas. Os
      investigadores desenvolven métodos para comprenderen mellor o
      mundo que nos arrodea. O tempo nas montañas pode mudar axiña e os
      camiñantes deben ter coidado. Moita xente vive nas cidades
      grandes e traballa nas oficinas ou nas fábricas. Os nenos van á
      escola cada mañá para aprenderen a ler, escribir e contar. Unha
      alimentación sa con froita e verdura é importante para o corpo. O
      tren sae da estación a tempo e chega á cidade pola noite. No
      verán as familias viaxan ao mar ou á montaña para descansaren. O
      goberno aprobou unha lei nova sobre a protección do medio
      ambiente. A música e a arte xogan un papel importante na vida de
      moita xente. Onte escribimos unha carta longa aos nosos amigos
      sobre a viaxe. O libro está enriba da mesa á beira da fiestra,
      agardando polo seu lector.""",
    "ms" -> """Sejarah sains menunjukkan bahawa idea baharu sering
      menghadapi tentangan sebelum diterima. Para penyelidik membina
      kaedah untuk memahami dunia di sekeliling kita dengan lebih baik.
      Cuaca di pergunungan boleh berubah dengan pantas dan pendaki
      mesti berhati-hati. Ramai orang tinggal di bandar besar dan
      bekerja di pejabat atau kilang. Kanak-kanak pergi ke sekolah
      setiap pagi untuk belajar membaca, menulis dan mengira. Makanan
      sihat dengan buah-buahan dan sayur-sayuran penting untuk badan.
      Kereta api bertolak dari stesen tepat pada masanya dan tiba di
      bandar pada waktu petang. Pada musim panas keluarga pergi ke laut
      atau ke gunung untuk berehat. Kerajaan telah meluluskan
      undang-undang baharu mengenai perlindungan alam sekitar. Muzik
      dan seni memainkan peranan penting dalam kehidupan ramai orang.
      Semalam kami menulis sepucuk surat panjang kepada rakan-rakan
      kami tentang perjalanan itu. Buku itu terletak di atas meja di
      sebelah tingkap menunggu pembacanya.""",
    "sq" -> """Historia e shkencës tregon se idetë e reja shpesh hasin
      kundërshtim para se të pranohen. Studiuesit zhvillojnë metoda për
      ta kuptuar më mirë botën përreth nesh. Moti në male mund të
      ndryshojë shpejt dhe udhëtarët duhet të jenë të kujdesshëm. Shumë
      njerëz jetojnë në qytete të mëdha dhe punojnë në zyra ose në
      fabrika. Fëmijët shkojnë çdo mëngjes në shkollë për të mësuar të
      lexojnë, të shkruajnë dhe të numërojnë. Ushqimi i shëndetshëm me
      fruta dhe perime është i rëndësishëm për trupin. Treni niset nga
      stacioni në kohë dhe mbërrin në qytet në mbrëmje. Në verë
      familjet udhëtojnë në det ose në male për t'u çlodhur. Qeveria ka
      miratuar një ligj të ri për mbrojtjen e mjedisit. Muzika dhe arti
      luajnë një rol të rëndësishëm në jetën e shumë njerëzve. Dje u
      shkruam miqve tanë një letër të gjatë për udhëtimin. Libri
      qëndron mbi tavolinë pranë dritares duke pritur lexuesin e vet.""",
    "sw" -> """Historia ya sayansi inaonyesha kwamba mawazo mapya mara
      nyingi hukutana na upinzani kabla ya kukubaliwa. Watafiti
      huendeleza mbinu za kuelewa vizuri zaidi ulimwengu unaotuzunguka.
      Hali ya hewa milimani inaweza kubadilika haraka na wasafiri
      wanapaswa kuwa waangalifu. Watu wengi wanaishi katika miji mikubwa
      na wanafanya kazi ofisini au viwandani. Watoto huenda shuleni kila
      asubuhi kujifunza kusoma, kuandika na kuhesabu. Chakula bora chenye
      matunda na mboga ni muhimu kwa mwili. Treni huondoka stesheni kwa
      wakati na kufika mjini jioni. Wakati wa kiangazi familia husafiri
      baharini au milimani kupumzika. Serikali imepitisha sheria mpya
      kuhusu ulinzi wa mazingira. Muziki na sanaa vina nafasi muhimu
      katika maisha ya watu wengi. Jana tuliwaandikia rafiki zetu barua
      ndefu kuhusu safari. Kitabu kiko mezani karibu na dirisha
      kikimsubiri msomaji wake.""",
    // --- round-19 Latin additions (VERDICT r18 #3): tl uz ceb — the
    // remaining major Latin-script web languages that labeled as a
    // wrong near-neighbor (tl/ceb→id/ms, uz→tr) ---
    "tl" -> """Ipinapakita ng kasaysayan ng agham na ang mga bagong ideya
      ay madalas na nakakaharap ng pagtutol bago tanggapin. Ang mga
      mananaliksik ay bumubuo ng mga pamamaraan upang mas maunawaan ang
      mundo sa ating paligid. Ang panahon sa kabundukan ay maaaring
      mabilis magbago at dapat mag-ingat ang mga manlalakbay. Maraming
      tao ang nakatira sa malalaking lungsod at nagtatrabaho sa mga
      opisina o pabrika. Ang mga bata ay pumapasok sa paaralan tuwing
      umaga upang matutong bumasa, sumulat at magbilang. Ang
      masustansyang pagkain na may prutas at gulay ay mahalaga para sa
      katawan. Ang tren ay umaalis sa istasyon sa tamang oras at
      dumarating sa lungsod sa gabi. Sa tag-init ang mga pamilya ay
      naglalakbay sa dagat o sa bundok upang magpahinga. Nagpasa ang
      pamahalaan ng bagong batas tungkol sa pangangalaga ng kapaligiran.
      Ang musika at sining ay may mahalagang papel sa buhay ng maraming
      tao. Kahapon ay sumulat kami ng mahabang liham sa aming mga
      kaibigan tungkol sa paglalakbay. Ang aklat ay nasa mesa sa tabi ng
      bintana at naghihintay sa mambabasa nito.""",
    "uz" -> """Fan tarixi yangi g'oyalar qabul qilinishidan oldin
      ko'pincha qarshilikka uchrashini ko'rsatadi. Tadqiqotchilar
      atrofimizdagi dunyoni yaxshiroq tushunish uchun usullar ishlab
      chiqadilar. Tog'lardagi ob-havo tez o'zgarishi mumkin, shuning
      uchun sayohatchilar ehtiyot bo'lishlari kerak. Ko'p odamlar katta
      shaharlarda yashaydilar va idoralarda yoki zavodlarda ishlaydilar.
      Bolalar har kuni ertalab o'qish, yozish va hisoblashni o'rganish
      uchun maktabga boradilar. Meva va sabzavotli sog'lom ovqat tana
      uchun muhimdir. Poyezd vokzaldan o'z vaqtida jo'naydi va kechqurun
      shaharga yetib boradi. Yozda oilalar dam olish uchun dengizga yoki
      tog'larga boradilar. Hukumat atrof-muhitni muhofaza qilish
      to'g'risida yangi qonun qabul qildi. Musiqa va san'at ko'p
      odamlarning hayotida muhim rol o'ynaydi. Kecha biz do'stlarimizga
      sayohat haqida uzun xat yozdik. Kitob deraza yonidagi stol ustida
      yotibdi va o'z o'quvchisini kutmoqda.""",
    "ceb" -> """Ang kasaysayan sa siyensiya nagpakita nga ang bag-ong mga
      ideya kanunay makasugat og pagsupak sa dili pa dawaton. Ang mga
      tigdukiduki naghimo og mga pamaagi aron mas masabtan ang kalibutan
      sa atong palibot. Ang panahon sa kabukiran mahimong mausab dayon
      ug ang mga magbabaktas kinahanglan mag-amping. Daghang mga tawo
      ang nagpuyo sa dagkong mga siyudad ug nagtrabaho sa mga opisina o
      pabrika. Ang mga bata moadto sa tunghaan matag buntag aron
      makakat-on sa pagbasa, pagsulat ug pag-ihap. Ang himsog nga
      pagkaon nga adunay prutas ug utanon mahinungdanon alang sa lawas.
      Ang tren mobiya sa estasyon sa saktong oras ug moabot sa siyudad
      sa gabii. Sa ting-init ang mga pamilya moadto sa dagat o sa bukid
      aron mopahulay. Ang kagamhanan nagpasar og bag-ong balaod bahin sa
      pagpanalipod sa kinaiyahan. Ang musika ug arte adunay
      mahinungdanong papel sa kinabuhi sa daghang mga tawo. Gahapon
      nagsulat kami og taas nga sulat sa among mga higala bahin sa
      panaw. Ang libro anaa sa lamesa tapad sa bintana ug nagpaabot sa
      magbabasa niini.""",
    // ha/yo (round 19, the last of the VERDICT r18 #3 Latin list):
    // Hausa's hooked ɓ/ɗ/ƙ and Yoruba's tone-marked underdot vowels
    // (combining U+0300/0301 over U+1ECD/1EB9 — no precomposed form)
    // depend on the widened Latin normalization alphabet
    "ha" -> """Tarihin kimiyya ya nuna cewa sababbin ra'ayoyi sukan
      fuskanci turjiya kafin a karɓe su. Masu bincike suna ƙirƙiro
      hanyoyi don fahimtar duniyar da ke kewaye da mu sosai. Yanayin
      sama a kan duwatsu na iya canzawa da sauri kuma dole matafiya su
      yi taka tsantsan. Mutane da yawa suna zaune a manyan birane kuma
      suna aiki a ofisoshi ko masana'antu. Yara suna zuwa makaranta
      kowace safiya don koyon karatu da rubutu da lissafi. Abinci mai
      lafiya tare da 'ya'yan itace da kayan lambu yana da muhimmanci
      ga jiki. Jirgin ƙasa yana tashi daga tashar a kan lokaci kuma
      yana isa birni da yamma. A lokacin rani iyalai sukan tafi bakin
      teku ko duwatsu don hutawa. Gwamnati ta zartar da sabuwar doka
      game da kare muhalli. Kiɗa da fasaha suna taka muhimmiyar rawa a
      rayuwar mutane da yawa. Jiya mun rubuta wa abokanmu doguwar
      wasiƙa game da tafiyar. Littafin yana kan tebur kusa da taga
      yana jiran mai karanta shi.""",
    "yo" -> """Ìtàn ìmọ̀ sáyẹ́nsì fi hàn pé àwọn èrò tuntun sábà máa ń
      kojú àtakò kí wọ́n tó gbà wọ́n. Àwọn olùwádìí ń ṣe àgbékalẹ̀ àwọn
      ọ̀nà láti ní òye ayé tí ó yí wa ká dáadáa. Ojú ọjọ́ lórí àwọn òkè
      lè yí padà kíákíá, àwọn arìnrìn-àjò sì gbọ́dọ̀ ṣọ́ra. Ọ̀pọ̀lọpọ̀
      ènìyàn ń gbé ní àwọn ìlú ńlá, wọ́n sì ń ṣiṣẹ́ ní ọ́fíìsì tàbí ilé
      iṣẹ́. Àwọn ọmọdé máa ń lọ sí ilé ìwé ní àárọ̀ kọ̀ọ̀kan láti kọ́
      kíkà, kíkọ àti ìṣirò. Oúnjẹ tó dára pẹ̀lú èso àti ẹ̀fọ́ ṣe pàtàkì
      fún ara. Ọkọ̀ ojú irin máa ń kúrò ní ibùdó ní àkókò, yóò sì dé
      ìlú ní ìrọ̀lẹ́. Ní ìgbà ẹ̀ẹ̀rùn àwọn ìdílé máa ń lọ sí etí òkun
      tàbí orí òkè láti sinmi. Ìjọba ti fọwọ́ sí òfin tuntun nípa
      ìdáàbòbò àyíká. Orin àti iṣẹ́ ọnà ní ipa pàtàkì nínú ìgbésí ayé
      ọ̀pọ̀ ènìyàn. Lánàá a kọ lẹ́tà gígùn sí àwọn ọ̀rẹ́ wa nípa
      ìrìn-àjò náà. Ìwé náà wà lórí tábìlì lẹ́gbẹ̀ẹ́ fèrèsé, ó sì ń
      dúró de òǹkàwé rẹ̀.""",
    // --- Cyrillic-script seeds (round 16, VERDICT r15 #6): same
    // encyclopedic register, normalized with NormRegexCyr ---
    "ru" -> """История науки показывает, что новые идеи часто встречают
      сопротивление, прежде чем их принимают. Исследователи разрабатывают
      методы, чтобы лучше понять мир вокруг нас. Погода в горах может
      быстро меняться, и туристам нужно быть осторожными. Многие люди
      живут в больших городах и работают в конторах или на заводах. Дети
      каждое утро идут в школу, чтобы учиться читать, писать и считать.
      Здоровое питание с фруктами и овощами важно для тела и ума. Поезд
      вовремя отходит от вокзала и вечером прибывает в город. Летом
      семьи едут к морю или в горы, чтобы отдохнуть. Правительство
      приняло новый закон об охране окружающей среды. Музыка и искусство
      играют важную роль в жизни многих людей. Вчера мы написали друзьям
      длинное письмо о путешествии. Книга лежит на столе у окна и ждёт
      своего читателя.""",
    "uk" -> """Історія науки показує, що нові ідеї часто зустрічають
      опір, перш ніж їх приймають. Дослідники розробляють методи, щоб
      краще зрозуміти світ навколо нас. Погода в горах може швидко
      змінюватися, і мандрівники повинні бути обережними. Багато людей
      живуть у великих містах і працюють в установах або на заводах.
      Діти щоранку йдуть до школи, щоб навчатися читати, писати й
      рахувати. Здорове харчування з фруктами та овочами важливе для
      тіла й розуму. Потяг вчасно відходить від вокзалу і ввечері
      прибуває до міста. Влітку родини їдуть до моря або в гори, щоб
      відпочити. Уряд ухвалив новий закон про охорону довкілля. Музика
      й мистецтво відіграють важливу роль у житті багатьох людей. Учора
      ми написали друзям довгого листа про подорож. Книжка лежить на
      столі біля вікна й чекає на свого читача.""",
    "bg" -> """Историята на науката показва, че новите идеи често
      срещат съпротива, преди да бъдат приети. Изследователите
      разработват методи, за да разберат по-добре света около нас.
      Времето в планините може бързо да се променя и туристите трябва
      да бъдат внимателни. Много хора живеят в големи градове и работят
      в канцеларии или заводи. Децата всяка сутрин отиват на училище,
      за да се учат да четат, пишат и смятат. Здравословното хранене с
      плодове и зеленчуци е важно за тялото и ума. Влакът тръгва
      навреме от гарата и вечерта пристига в града. През лятото
      семействата пътуват до морето или в планината, за да си починат.
      Правителството прие нов закон за опазване на околната среда.
      Музиката и изкуството играят важна роля в живота на много хора.
      Вчера написахме дълго писмо на приятелите си за пътуването.
      Книгата лежи на масата до прозореца и чака своя читател.""",
    "sr" -> """Историја науке показује да нове идеје често наилазе на
      отпор пре него што буду прихваћене. Истраживачи развијају методе
      да боље разумеју свет око нас. Време у планинама може брзо да се
      мења и планинари морају бити опрезни. Много људи живи у великим
      градовима и ради у канцеларијама или фабрикама. Деца свако јутро
      иду у школу да уче да читају, пишу и рачунају. Здрава исхрана са
      воћем и поврћем важна је за тело и ум. Воз полази са станице на
      време и увече стиже у град. Лети породице путују на море или у
      планине да се одморе. Влада је донела нови закон о заштити
      животне средине. Музика и уметност играју важну улогу у животу
      многих људи. Јуче смо пријатељима написали дуго писмо о путовању.
      Књига лежи на столу поред прозора и чека свог читаоца.""",
    // --- round-19 Cyrillic additions (VERDICT r18 #3): be kk ky mk
    // mn tg — the major non-Slavic (and remaining Slavic) Cyrillic
    // web languages; kk/ky/mn/tg depend on the widened normalization
    // keeping the U+0460–04FF extended letters ---
    "be" -> """Гісторыя навукі паказвае, што новыя ідэі часта
      сустракаюць супраціў, перш чым іх прымаюць. Даследчыкі
      распрацоўваюць метады, каб лепш зразумець свет вакол нас.
      Надвор'е ў гарах можа хутка змяняцца, і вандроўнікі павінны быць
      асцярожнымі. Шмат людзей жывуць у вялікіх гарадах і працуюць ва
      ўстановах або на заводах. Дзеці кожную раніцу ідуць у школу, каб
      вучыцца чытаць, пісаць і лічыць. Здаровае харчаванне з садавіной
      і гароднінай важнае для цела і розуму. Цягнік своечасова
      адыходзіць ад вакзала і ўвечары прыбывае ў горад. Улетку сем'і
      едуць да мора або ў горы, каб адпачыць. Урад прыняў новы закон
      аб ахове навакольнага асяроддзя. Музыка і мастацтва адыгрываюць
      важную ролю ў жыцці многіх людзей. Учора мы напісалі сябрам
      доўгі ліст пра падарожжа. Кніга ляжыць на стале каля акна і
      чакае свайго чытача.""",
    "kk" -> """Ғылым тарихы жаңа идеялардың қабылданғанға дейін жиі
      қарсылыққа тап болатынын көрсетеді. Зерттеушілер айналамыздағы
      әлемді жақсырақ түсіну үшін әдістер жасайды. Таудағы ауа райы
      тез өзгеруі мүмкін, сондықтан саяхатшылар сақ болуы керек. Көп
      адамдар үлкен қалаларда тұрады және кеңселерде немесе зауыттарда
      жұмыс істейді. Балалар әр таң сайын оқу, жазу және санау үйрену
      үшін мектепке барады. Жемістер мен көкөністері бар пайдалы тамақ
      дене үшін маңызды. Пойыз вокзалдан уақытында шығып, кешке қалаға
      жетеді. Жазда отбасылар демалу үшін теңізге немесе тауға барады.
      Үкімет қоршаған ортаны қорғау туралы жаңа заң қабылдады. Музыка
      мен өнер көп адамдардың өмірінде маңызды рөл атқарады. Кеше біз
      достарымызға сапар туралы ұзақ хат жаздық. Кітап терезенің
      жанындағы үстелде жатыр және өз оқырманын күтеді.""",
    "ky" -> """Илимдин тарыхы жаңы идеялар кабыл алынганга чейин көп
      учурда каршылыкка туш болорун көрсөтөт. Изилдөөчүлөр
      айланабыздагы дүйнөнү жакшыраак түшүнүү үчүн ыкмаларды иштеп
      чыгышат. Тоодогу аба ырайы тез өзгөрүшү мүмкүн, ошондуктан
      саякатчылар этият болушу керек. Көп адамдар чоң шаарларда
      жашашат жана кеңселерде же заводдордо иштешет. Балдар ар күн
      эртең менен окуганды, жазганды жана эсептегенди үйрөнүү үчүн
      мектепке барышат. Жемиштер менен жашылчалары бар пайдалуу тамак
      дене үчүн маанилүү. Поезд вокзалдан өз убагында чыгып, кечинде
      шаарга жетет. Жайында үй-бүлөлөр эс алуу үчүн деңизге же тоого
      барышат. Өкмөт айлана-чөйрөнү коргоо жөнүндө жаңы мыйзам кабыл
      алды. Музыка менен искусство көп адамдардын жашоосунда маанилүү
      роль ойнойт. Кечээ биз досторубузга сапар жөнүндө узун кат
      жаздык. Китеп терезенин жанындагы үстөлдө жатат жана өз
      окурманын күтөт.""",
    "mk" -> """Историјата на науката покажува дека новите идеи често
      наидуваат на отпор пред да бидат прифатени. Истражувачите
      развиваат методи за подобро да го разберат светот околу нас.
      Времето во планините може брзо да се промени и планинарите мора
      да бидат внимателни. Многу луѓе живеат во големи градови и
      работат во канцеларии или фабрики. Децата секое утро одат на
      училиште за да учат да читаат, пишуваат и сметаат. Здравата
      храна со овошје и зеленчук е важна за телото и умот. Возот
      тргнува од станицата навреме и навечер пристигнува во градот. Во
      лето семејствата патуваат на море или на планина за да се
      одморат. Владата донесе нов закон за заштита на животната
      средина. Музиката и уметноста играат важна улога во животот на
      многу луѓе. Вчера им напишавме долго писмо на нашите пријатели
      за патувањето. Книгата лежи на масата до прозорецот и го чека
      својот читател.""",
    "mn" -> """Шинжлэх ухааны түүх шинэ санаанууд хүлээн
      зөвшөөрөгдөхөөсөө өмнө ихэвчлэн эсэргүүцэлтэй тулгардаг гэдгийг
      харуулдаг. Судлаачид бидний эргэн тойрон дахь ертөнцийг илүү
      сайн ойлгохын тулд аргууд боловсруулдаг. Уулын цаг агаар хурдан
      өөрчлөгдөж болох тул аялагчид болгоомжтой байх ёстой. Олон
      хүмүүс том хотод амьдардаг бөгөөд албан газар эсвэл үйлдвэрт
      ажилладаг. Хүүхдүүд өглөө бүр унших, бичих, тоолох сурахын тулд
      сургуульд явдаг. Жимс, ногоотой эрүүл хоол бие махбодод чухал.
      Галт тэрэг буудлаас цагтаа хөдөлж, орой хотод хүрдэг. Зун гэр
      бүлүүд амрахын тулд далай эсвэл уул руу явдаг. Засгийн газар
      байгаль орчныг хамгаалах тухай шинэ хууль баталлаа. Хөгжим,
      урлаг олон хүний амьдралд чухал үүрэг гүйцэтгэдэг. Өчигдөр бид
      найзууддаа аяллын тухай урт захидал бичсэн. Ном цонхны дэргэдэх
      ширээн дээр хэвтэж, уншигчаа хүлээж байна.""",
    "tg" -> """Таърихи илм нишон медиҳад, ки ақидаҳои нав пеш аз қабул
      шудан аксар вақт бо муқовимат рӯ ба рӯ мешаванд. Муҳаққиқон
      барои беҳтар фаҳмидани ҷаҳони атрофи мо усулҳо таҳия мекунанд.
      Ҳавои кӯҳистон метавонад зуд тағйир ёбад ва сайёҳон бояд
      эҳтиёткор бошанд. Бисёр одамон дар шаҳрҳои калон зиндагӣ
      мекунанд ва дар идораҳо ё корхонаҳо кор мекунанд. Кӯдакон ҳар
      субҳ ба мактаб мераванд, то хондан, навиштан ва ҳисоб карданро
      омӯзанд. Хӯроки солим бо мева ва сабзавот барои бадан муҳим
      аст. Қатора аз истгоҳ саривақт мебарояд ва бегоҳ ба шаҳр
      мерасад. Дар тобистон оилаҳо барои истироҳат ба баҳр ё кӯҳҳо
      мераванд. Ҳукумат дар бораи ҳифзи муҳити зист қонуни нав қабул
      кард. Мусиқӣ ва санъат дар ҳаёти бисёр одамон нақши муҳим
      мебозанд. Дирӯз мо ба дӯстонамон дар бораи сафар номаи дароз
      навиштем. Китоб дар рӯи миз дар назди тиреза хобидааст ва
      хонандаи худро интизор аст.""",
    // round-20 Cyrillic additions (VERDICT r19 #4): tt/ba are the
    // tight Kipchak pair (their discriminators against kk and each
    // other: tt җ/чы vs ba ҙ/ҫ/ҡ), cv is the lone Oghur language
    // (ӑ/ӗ/ҫ/ӳ-heavy, structurally far from all of them)
    "tt" -> """Фән тарихы яңа фикерләрнең кабул ителгәнче еш кына
      каршылыкка очравын күрсәтә. Тикшеренүчеләр тирә-юньдәге дөньяны
      яхшырак аңлар өчен ысуллар эшлиләр. Таулардагы һава торышы тиз
      үзгәрергә мөмкин, шуңа күрә сәяхәтчеләр сак булырга тиеш. Күп
      кешеләр зур шәһәрләрдә яши һәм офисларда яки заводларда эшли.
      Балалар һәр иртә укырга, язарга һәм санарга өйрәнер өчен
      мәктәпкә баралар. Җиләк-җимеш һәм яшелчәләр белән сәламәт ризык
      тән өчен бик мөһим. Поезд станциядән үз вакытында чыга һәм кичен
      шәһәргә килеп җитә. Җәен гаиләләр ял итәр өчен диңгезгә яки
      тауларга баралар. Хөкүмәт әйләнә-тирә мохитне саклау турында яңа
      закон кабул итте. Музыка һәм сәнгать күп кешеләрнең тормышында
      мөһим роль уйный. Кичә без дусларыбызга сәяхәт турында озын хат
      яздык. Китап тәрәзә янындагы өстәлдә ята һәм үз укучысын
      көтә.""",
    "ba" -> """Фән тарихы яңы фекерҙәрҙең ҡабул ителгәнсе йыш ҡына
      ҡаршылыҡҡа осрауын күрһәтә. Тикшеренеүселәр тирә-яҡтағы донъяны
      яҡшыраҡ аңлау өсөн ысулдар эшләй. Тауҙарҙағы һауа торошо тиҙ
      үҙгәрергә мөмкин, шуға күрә сәйәхәтселәр һаҡ булырға тейеш. Күп
      кешеләр ҙур ҡалаларҙа йәшәй һәм офистарҙа йәки заводтарҙа эшләй.
      Балалар һәр иртә уҡырға, яҙырға һәм һанарға өйрәнеү өсөн
      мәктәпкә бара. Емеш-еләк һәм йәшелсәләр менән файҙалы аҙыҡ тән
      өсөн бик мөһим. Поезд станциянан үҙ ваҡытында сыға һәм кис
      ҡалаға килеп етә. Йәйен ғаиләләр ял итеү өсөн диңгеҙгә йәки
      тауҙарға бара. Хөкүмәт әйләнә-тирә мөхитте һаҡлау тураһында яңы
      закон ҡабул итте. Музыка һәм сәнғәт күп кешеләрҙең тормошонда
      мөһим роль уйнай. Кисә беҙ дуҫтарыбыҙға сәйәхәт тураһында оҙон
      хат яҙҙыҡ. Китап тәҙрә янындағы өҫтәлдә ята һәм үҙ уҡыусыһын
      көтә.""",
    "cv" -> """Ӑслӑлӑх историйӗ ҫӗнӗ шухӑшсем йышӑниччен час-часах
      хирӗҫӳпе тӗл пулнине кӑтартать. Тӗпчевҫӗсем таврари тӗнчене
      лайӑхрах ӑнланма меслетсем хатӗрлеҫҫӗ. Тусем ҫинчи ҫанталӑк
      хӑвӑрт улшӑнма пултарать, ҫавӑнпа ҫулҫӳревҫӗсен асӑрхануллӑ
      пулмалла. Нумай ҫын пысӑк хуласенче пурӑнать тата офиссенче е
      заводсенче ӗҫлет. Ачасем кашни ир вулама, ҫырма тата шутлама
      вӗренме шкула каяҫҫӗ. Улма-ҫырлапа пахча ҫимӗҫлӗ сывлӑхлӑ апат
      ӳт-пӳшӗн питӗ кирлӗ. Поезд станцирен хӑй вӑхӑтӗнче тухать те
      каҫхине хулана ҫитет. Ҫулла ҫемьесем канма тинӗсе е тусем патне
      каяҫҫӗ. Правительство таврари ҫутҫанталӑка сыхласси ҫинчен ҫӗнӗ
      саккун йышӑннӑ. Кӗвӗпе ӳнер нумай ҫын пурнӑҫӗнче пысӑк вырӑн
      йышӑнаҫҫӗ. Ӗнер эпир туссене ҫул ҫӳрев ҫинчен вӑрӑм ҫыру
      ҫыртӑмӑр. Кӗнеке чӳрече ҫумӗнчи сӗтел ҫинче выртать те хӑйӗн
      вулаканне кӗтет.""",
    // --- Arabic-script seeds: normalized with NormRegexArab ---
    "ar" -> """تاريخ العلم يبين أن الأفكار الجديدة كثيرا ما تواجه مقاومة
      قبل أن تقبل. يطور الباحثون طرقا لفهم العالم من حولنا بشكل أفضل.
      الطقس في الجبال يمكن أن يتغير بسرعة وعلى المتنزهين أن يكونوا
      حذرين. كثير من الناس يعيشون في مدن كبيرة ويعملون في مكاتب أو
      مصانع. يذهب الأطفال إلى المدرسة كل صباح ليتعلموا القراءة والكتابة
      والحساب. الغذاء الصحي مع الفواكه والخضروات مهم للجسم والعقل.
      يغادر القطار المحطة في موعده ويصل إلى المدينة في المساء. في الصيف
      تسافر العائلات إلى البحر أو الجبال للراحة. أقرت الحكومة قانونا
      جديدا حول حماية البيئة. تلعب الموسيقى والفن دورا مهما في حياة
      كثير من الناس. كتبنا أمس رسالة طويلة إلى أصدقائنا عن الرحلة.
      الكتاب على الطاولة بجانب النافذة ينتظر قارئه.""",
    "fa" -> """تاریخ علم نشان می دهد که اندیشه های نو پیش از پذیرفته
      شدن اغلب با مقاومت روبرو می شوند. پژوهشگران روش هایی را گسترش می
      دهند تا جهان پیرامون ما را بهتر بشناسند. هوای کوهستان می تواند به
      سرعت تغییر کند و کوهنوردان باید محتاط باشند. بسیاری از مردم در
      شهرهای بزرگ زندگی می کنند و در اداره ها یا کارخانه ها کار می
      کنند. کودکان هر روز صبح به مدرسه می روند تا خواندن و نوشتن و حساب
      را بیاموزند. خوراک سالم با میوه و سبزی برای تن و روان اهمیت دارد.
      قطار به موقع از ایستگاه حرکت می کند و شامگاه به شهر می رسد. در
      تابستان خانواده ها برای آسودن به دریا یا کوهستان می روند. دولت
      قانون تازه ای درباره نگهداری از محیط زیست گذرانده است. موسیقی و
      هنر در زندگی بسیاری از مردم نقش مهمی دارند. دیروز نامه ای بلند
      درباره سفر برای دوستان خود نوشتیم. کتاب روی میز کنار پنجره است و
      چشم به راه خواننده خود می ماند.""",
    "ur" -> """سائنس کی تاریخ بتاتی ہے کہ نئے خیالات قبول ہونے سے پہلے
      اکثر مزاحمت کا سامنا کرتے ہیں۔ محقق ایسے طریقے بناتے ہیں جن سے
      ہمارے گرد کی دنیا کو بہتر سمجھا جا سکے۔ پہاڑوں کا موسم تیزی سے
      بدل سکتا ہے اور سیاحوں کو محتاط رہنا چاہیے۔ بہت سے لوگ بڑے شہروں
      میں رہتے ہیں اور دفتروں یا کارخانوں میں کام کرتے ہیں۔ بچے ہر صبح
      پڑھنا لکھنا اور حساب سیکھنے کے لیے اسکول جاتے ہیں۔ پھلوں اور
      سبزیوں والی صحت مند خوراک جسم اور ذہن کے لیے ضروری ہے۔ ریل گاڑی
      وقت پر اسٹیشن سے چلتی ہے اور شام کو شہر پہنچتی ہے۔ گرمیوں میں
      خاندان آرام کے لیے سمندر یا پہاڑوں کا رخ کرتے ہیں۔ حکومت نے ماحول
      کے تحفظ کے بارے میں نیا قانون منظور کیا ہے۔ موسیقی اور فن بہت سے
      لوگوں کی زندگی میں اہم کردار ادا کرتے ہیں۔ کل ہم نے سفر کے بارے
      میں اپنے دوستوں کو لمبا خط لکھا۔ کتاب میز پر کھڑکی کے پاس پڑی
      اپنے پڑھنے والے کا انتظار کرتی ہے۔""",
    // round-19 Arabic-script addition (VERDICT r18 #3): ps
    "ps" -> """د علم تاریخ ښيي چې نوي فکرونه د منل کېدو دمخه ډېر ځله له
      مقاومت سره مخ کېږي. څېړونکي داسې لارې چارې جوړوي چې زموږ شاوخوا
      نړۍ ښه وپېژني. د غرونو هوا کولای شي ژر بدله شي او ګرځندویان باید
      محتاط وي. ډېر خلک په لویو ښارونو کې ژوند کوي او په دفترونو یا
      فابریکو کې کار کوي. ماشومان هر سهار ښوونځي ته ځي چې لوستل، لیکل
      او شمېرل زده کړي. له مېوو او سبزیو سره روغ خواړه د بدن لپاره مهم
      دي. اورګاډی له تمځای څخه پر خپل وخت روانېږي او ماښام ښار ته
      رسېږي. په اوړي کې کورنۍ د استراحت لپاره سمندر یا غرونو ته ځي.
      حکومت د چاپېریال د ساتنې په اړه نوی قانون تصویب کړ. موسیقي او
      هنر د ډېرو خلکو په ژوند کې مهم رول لوبوي. پرون موږ خپلو ملګرو ته
      د سفر په اړه اوږد لیک ولیکه. کتاب د کړکۍ څنګ ته پر مېز پروت دی
      او خپل لوستونکي ته انتظار باسي.""",
    // ckb (round 19): Sorani Kurdish — ە-heavy, depends on the
    // widened Arabic normalization
    "ckb" -> """مێژووی زانست نیشان دەدات کە بیرۆکە نوێیەکان زۆر جار
      پێش ئەوەی قبووڵ بکرێن ڕووبەڕووی بەرهەڵستی دەبنەوە. توێژەران
      ڕێگاکان پەرە پێدەدەن بۆ ئەوەی جیهانی دەوروبەرمان باشتر تێبگەن.
      کەشوهەوای چیاکان دەتوانێت بە خێرایی بگۆڕێت و گەشتیاران دەبێت
      وریا بن. زۆر کەس لە شارە گەورەکاندا دەژین و لە نووسینگە یان
      کارگەکاندا کار دەکەن. منداڵان هەموو بەیانییەک دەچنە قوتابخانە بۆ
      فێربوونی خوێندنەوە و نووسین و ژماردن. خواردنی تەندروست لەگەڵ
      میوە و سەوزە بۆ لەش گرنگە. شەمەندەفەر لە کاتی خۆیدا لە وێستگە
      دەردەچێت و ئێوارە دەگاتە شار. لە هاویندا خێزانەکان بۆ پشوودان
      دەچنە دەریا یان چیاکان. حکومەت یاسایەکی نوێی لەسەر پاراستنی
      ژینگە پەسەند کرد. مۆسیقا و هونەر ڕۆڵێکی گرنگ دەگێڕن لە ژیانی
      زۆر کەسدا. دوێنێ نامەیەکی درێژمان بۆ هاوڕێکانمان نووسی دەربارەی
      گەشتەکە. کتێبەکە لەسەر مێزەکەیە لە تەنیشت پەنجەرەکە و چاوەڕوانی
      خوێنەرەکەی دەکات.""",
    // round-20 Arabic-script additions (VERDICT r19 #4): ug (fully
    // vowelled — the ئـ hamza carrier + ۇ/ۆ/ۈ/ې vowels separate it
    // sharply from the consonantal neighbors), sd (the implosive
    // series ٻ/ڄ/ڏ/ڳ plus ڪ for kaf)
    "ug" -> """پەن تارىخى يېڭى پىكىرلەرنىڭ قوبۇل قىلىنىشتىن بۇرۇن دائىم
      قارشىلىققا ئۇچرايدىغانلىقىنى كۆرسىتىدۇ. تەتقىقاتچىلار
      ئەتراپىمىزدىكى دۇنيانى تېخىمۇ ياخشى چۈشىنىش ئۈچۈن ئۇسۇللارنى
      يارىتىدۇ. تاغدىكى ھاۋا تېز ئۆزگىرىشى مۇمكىن، شۇڭا ساياھەتچىلەر
      ئېھتىياتچان بولۇشى كېرەك. نۇرغۇن كىشىلەر چوڭ شەھەرلەردە ياشايدۇ
      ۋە ئىشخانىلاردا ياكى زاۋۇتلاردا ئىشلەيدۇ. بالىلار ھەر كۈنى
      ئەتىگەندە ئوقۇش، يېزىش ۋە ھېسابلاشنى ئۆگىنىش ئۈچۈن مەكتەپكە
      بارىدۇ. مېۋە ۋە كۆكتاتلىق ساغلام يېمەكلىك بەدەن ئۈچۈن مۇھىم.
      پويىز ئىستانسىدىن ئۆز ۋاقتىدا يولغا چىقىدۇ ۋە كەچتە شەھەرگە
      يېتىپ بارىدۇ. يازدا ئائىلىلەر دەم ئېلىش ئۈچۈن دېڭىزغا ياكى
      تاغقا بارىدۇ. ھۆكۈمەت مۇھىت ئاسراش توغرىسىدا يېڭى قانۇن
      ماقۇللىدى. مۇزىكا ۋە سەنئەت نۇرغۇن كىشىلەرنىڭ ھاياتىدا مۇھىم
      رول ئوينايدۇ. تۈنۈگۈن بىز دوستلىرىمىزغا ساياھەت توغرىسىدا
      ئۇزۇن خەت يازدۇق. كىتاب دېرىزە يېنىدىكى ئۈستەلدە تۇرىدۇ ۋە ئۆز
      ئوقۇرمىنىنى كۈتىدۇ.""",
    "sd" -> """سائنس جي تاريخ ڏيکاري ٿي ته نوان خيال قبول ٿيڻ کان اڳ
      اڪثر مزاحمت کي منهن ڏين ٿا. محقق اهڙا طريقا ٺاهين ٿا جن سان
      اسان جي چوڌاري دنيا کي بهتر سمجهي سگهجي. جبلن جي موسم تيزيءَ
      سان بدلجي سگهي ٿي ۽ سياحن کي محتاط رهڻ گهرجي. گهڻا ماڻهو وڏن
      شهرن ۾ رهن ٿا ۽ آفيسن يا ڪارخانن ۾ ڪم ڪن ٿا. ٻار هر صبح پڙهڻ،
      لکڻ ۽ حساب سکڻ لاءِ اسڪول وڃن ٿا. ميون ۽ ڀاڄين سان صحتمند کاڌو
      جسم لاءِ ضروري آهي. ريل گاڏي وقت تي اسٽيشن کان هلي ٿي ۽ شام جو
      شهر پهچي ٿي. اونهاري ۾ خاندان آرام لاءِ سمنڊ يا جبلن ڏانهن وڃن
      ٿا. حڪومت ماحول جي حفاظت بابت نئون قانون منظور ڪيو آهي. موسيقي
      ۽ فن گهڻن ماڻهن جي زندگيءَ ۾ اهم ڪردار ادا ڪن ٿا. ڪالهه اسان
      سفر بابت پنهنجن دوستن کي ڊگهو خط لکيو. ڪتاب ميز تي دريءَ جي
      ڀرسان پيو آهي ۽ پنهنجي پڙهندڙ جو انتظار ڪري ٿو.""",
    // --- Devanagari seeds: normalized with NormRegexDeva ---
    "hi" -> """विज्ञान का इतिहास दिखाता है कि नए विचारों को स्वीकार किए
      जाने से पहले अक्सर विरोध का सामना करना पड़ता है। शोधकर्ता ऐसे
      तरीके बनाते हैं जिनसे हमारे आसपास की दुनिया को बेहतर समझा जा
      सके। पहाड़ों का मौसम तेजी से बदल सकता है और यात्रियों को सावधान
      रहना चाहिए। बहुत से लोग बड़े शहरों में रहते हैं और दफ्तरों या
      कारखानों में काम करते हैं। बच्चे हर सुबह पढ़ना लिखना और गिनती
      सीखने के लिए स्कूल जाते हैं। फलों और सब्जियों वाला स्वस्थ भोजन
      शरीर और मन के लिए जरूरी है। रेलगाड़ी समय पर स्टेशन से चलती है
      और शाम को शहर पहुंचती है। गर्मियों में परिवार आराम के लिए समुद्र
      या पहाड़ों की ओर जाते हैं। सरकार ने पर्यावरण की रक्षा के बारे
      में नया कानून पारित किया है। संगीत और कला बहुत से लोगों के जीवन
      में महत्वपूर्ण भूमिका निभाते हैं। कल हमने यात्रा के बारे में
      अपने दोस्तों को लंबा पत्र लिखा। किताब मेज पर खिड़की के पास पड़ी
      अपने पाठक की प्रतीक्षा करती है।""",
    "mr" -> """विज्ञानाचा इतिहास दाखवतो की नव्या कल्पनांना स्वीकारले
      जाण्यापूर्वी अनेकदा विरोधाला तोंड द्यावे लागते. संशोधक असे मार्ग
      शोधतात ज्यांमुळे आपल्या भोवतालचे जग अधिक चांगले समजते. डोंगरातले
      हवामान झपाट्याने बदलू शकते आणि प्रवाशांनी काळजी घेतली पाहिजे.
      पुष्कळ लोक मोठ्या शहरांमध्ये राहतात आणि कार्यालयांत किंवा
      कारखान्यांत काम करतात. मुले रोज सकाळी वाचन लेखन आणि गणित
      शिकण्यासाठी शाळेत जातात. फळे आणि भाज्या असलेला सकस आहार शरीरासाठी
      आणि मनासाठी आवश्यक आहे. आगगाडी वेळेवर स्थानकावरून निघते आणि
      संध्याकाळी शहरात पोहोचते. उन्हाळ्यात कुटुंबे विश्रांतीसाठी
      समुद्रावर किंवा डोंगरात जातात. सरकारने पर्यावरणाच्या रक्षणाबाबत
      नवा कायदा मंजूर केला आहे. संगीत आणि कला अनेक लोकांच्या जीवनात
      महत्त्वाची भूमिका बजावतात. काल आम्ही प्रवासाबद्दल आमच्या
      मित्रांना लांब पत्र लिहिले. पुस्तक टेबलावर खिडकीजवळ पडून आपल्या
      वाचकाची वाट पाहते आहे.""",
    "ne" -> """विज्ञानको इतिहासले देखाउँछ कि नयाँ विचारहरूले स्वीकार
      हुनुअघि प्रायः विरोधको सामना गर्नुपर्छ। अनुसन्धानकर्ताहरूले
      हाम्रो वरपरको संसारलाई राम्ररी बुझ्न सकिने तरिकाहरू बनाउँछन्।
      पहाडको मौसम छिटो बदलिन सक्छ र यात्रीहरू होसियार हुनुपर्छ। धेरै
      मानिसहरू ठूला सहरहरूमा बस्छन् र कार्यालय वा कारखानाहरूमा काम
      गर्छन्। केटाकेटीहरू हरेक बिहान पढ्न लेख्न र हिसाब सिक्न विद्यालय
      जान्छन्। फलफूल र तरकारी भएको स्वस्थ खाना शरीर र मनका लागि जरुरी
      छ। रेल समयमै स्टेसनबाट छुट्छ र साँझ सहर पुग्छ। गर्मीमा परिवारहरू
      आराम गर्न समुद्र वा पहाडतिर जान्छन्। सरकारले वातावरणको संरक्षणका
      बारेमा नयाँ कानुन पारित गरेको छ। सङ्गीत र कलाले धेरै मानिसहरूको
      जीवनमा महत्त्वपूर्ण भूमिका खेल्छन्। हिजो हामीले यात्राका बारेमा
      आफ्ना साथीहरूलाई लामो चिठी लेख्यौं। किताब टेबलमा झ्यालनजिकै रहेर
      आफ्नो पाठकको प्रतीक्षा गर्छ।""",
    // --- Bengali-script seeds: normalized with NormRegexBeng ---
    "bn" -> """বিজ্ঞানের ইতিহাস দেখায় যে নতুন ধারণাগুলি গৃহীত হওয়ার
      আগে প্রায়ই বাধার সম্মুখীন হয়। গবেষকেরা এমন পদ্ধতি তৈরি করেন
      যার মাধ্যমে আমাদের চারপাশের জগৎকে আরও ভালোভাবে বোঝা যায়।
      পাহাড়ের আবহাওয়া দ্রুত বদলে যেতে পারে এবং যাত্রীদের সাবধান
      থাকা উচিত। অনেক মানুষ বড় শহরে বাস করে এবং অফিসে বা কারখানায়
      কাজ করে। শিশুরা প্রতিদিন সকালে পড়া লেখা আর অঙ্ক শিখতে
      বিদ্যালয়ে যায়। ফল ও সবজি সহ স্বাস্থ্যকর খাবার শরীর ও মনের
      জন্য জরুরি। রেলগাড়ি সময়মতো স্টেশন থেকে ছাড়ে এবং সন্ধ্যায়
      শহরে পৌঁছায়। গ্রীষ্মে পরিবারগুলি বিশ্রামের জন্য সমুদ্রে বা
      পাহাড়ে যায়। সরকার পরিবেশ রক্ষার বিষয়ে নতুন আইন পাস করেছে।
      সংগীত ও শিল্প বহু মানুষের জীবনে গুরুত্বপূর্ণ ভূমিকা পালন করে।
      গতকাল আমরা যাত্রা সম্পর্কে আমাদের বন্ধুদের দীর্ঘ চিঠি লিখেছি।
      বইটি টেবিলের উপর জানালার পাশে পড়ে তার পাঠকের অপেক্ষা করছে।""",
    "as" -> """বিজ্ঞানৰ ইতিহাসে দেখুৱায় যে নতুন ধাৰণাবোৰ গ্ৰহণ হোৱাৰ
      আগতে প্ৰায়ে বাধাৰ সন্মুখীন হয়। গৱেষকসকলে এনে পদ্ধতি উলিয়ায়
      যাৰ জৰিয়তে আমাৰ চাৰিওফালৰ জগতখন ভালদৰে বুজিব পাৰি। পাহাৰৰ বতৰ
      সোনকালে সলনি হব পাৰে আৰু যাত্ৰীসকলে সাৱধান হোৱা উচিত। বহুতো
      মানুহে ডাঙৰ চহৰত বাস কৰে আৰু কাৰ্যালয়ত বা কাৰখানাত কাম কৰে।
      শিশুসকলে প্ৰতিদিনে ৰাতিপুৱা পঢ়া লিখা আৰু অংক শিকিবলৈ
      বিদ্যালয়লৈ যায়। ফলমূল আৰু পাচলিৰে সৈতে স্বাস্থ্যকৰ আহাৰ শৰীৰ
      আৰু মনৰ বাবে প্ৰয়োজনীয়। ৰেলগাড়ীখন সময়মতে ষ্টেচনৰ পৰা এৰে
      আৰু সন্ধিয়া চহৰ পায়। গৰমৰ দিনত পৰিয়ালবোৰে জিৰণিৰ বাবে
      সাগৰলৈ বা পাহাৰলৈ যায়। চৰকাৰে পৰিৱেশ সুৰক্ষাৰ বিষয়ে নতুন আইন
      গ্ৰহণ কৰিছে। সংগীত আৰু কলাই বহু মানুহৰ জীৱনত গুৰুত্বপূৰ্ণ
      ভূমিকা পালন কৰে। যোৱাকালি আমি যাত্ৰাৰ বিষয়ে আমাৰ বন্ধুসকললৈ
      দীঘল চিঠি লিখিছিলোঁ। কিতাপখন মেজৰ ওপৰত খিৰিকীৰ কাষত পৰি আছে
      আৰু পঢ়ুৱৈৰ বাবে ৰৈ আছে।""",
    // --- Ethiopic-script seeds (round 18, VERDICT r17 #5): the block
    // carries Amharic AND Tigrinya — normalized with NormRegexEthi ---
    "am" -> """የሳይንስ ታሪክ አዳዲስ ሀሳቦች ተቀባይነት ከማግኘታቸው በፊት ብዙ ጊዜ
      ተቃውሞ እንደሚገጥማቸው ያሳያል። ተመራማሪዎች በዙሪያችን ያለውን ዓለም በተሻለ
      ለመረዳት ዘዴዎችን ያዘጋጃሉ። በተራሮች ላይ ያለው የአየር ሁኔታ በፍጥነት ሊለወጥ
      ይችላል እና ተጓዦች ጥንቃቄ ማድረግ አለባቸው። ብዙ ሰዎች በትላልቅ ከተሞች
      ይኖራሉ እና በቢሮዎች ወይም በፋብሪካዎች ይሠራሉ። ልጆች ማንበብ፣ መጻፍ እና
      ማስላት ለመማር በየጠዋቱ ወደ ትምህርት ቤት ይሄዳሉ። ከፍራፍሬ እና ከአትክልት
      ጋር ጤናማ ምግብ ለሰውነት አስፈላጊ ነው። ባቡሩ በሰዓቱ ከጣቢያው ይነሳል እና
      ምሽት ላይ ከተማዋ ይደርሳል። በበጋ ወቅት ቤተሰቦች ለማረፍ ወደ ባሕር ወይም ወደ
      ተራሮች ይሄዳሉ። መንግሥት ስለ አካባቢ ጥበቃ አዲስ ሕግ አጽድቋል። ሙዚቃ እና
      ሥነ ጥበብ በብዙ ሰዎች ሕይወት ውስጥ ትልቅ ሚና ይጫወታሉ። ትናንት ስለ ጉዞው
      ለጓደኞቻችን ረጅም ደብዳቤ ጻፍን። መጽሐፉ በመስኮቱ አጠገብ ባለው ጠረጴዛ ላይ
      ተቀምጦ አንባቢውን ይጠብቃል።""",
    "ti" -> """ታሪኽ ሳይንስ ሓደስቲ ሓሳባት ቅድሚ ምቕባሎም ብዙሕ ግዜ ተቓውሞ ከም
      ዘጋጥሞም የርኢ። ተመራመርቲ ነቲ ኣብ ከባቢና ዘሎ ዓለም ብዝበለጸ ንምርዳእ
      ሜላታት የማዕብሉ። ኣብ ጎቦታት ዘሎ ኩነታት ኣየር ብቕልጡፍ ክቕየር ይኽእል እዩ
      እሞ ተጓዓዝቲ ጥንቃቐ ክገብሩ ኣለዎም። ብዙሓት ሰባት ኣብ ዓበይቲ ከተማታት
      ይነብሩ ኣብ ቤት ጽሕፈታት ወይ ፋብሪካታት ከኣ ይሰርሑ። ቆልዑ ምንባብ፣ ምጽሓፍ
      ከምኡውን ምቑጻር ንምምሃር ኣብ ነፍሲ ወከፍ ንግሆ ናብ ቤት ትምህርቲ ይኸዱ።
      ምስ ፍረታት ከምኡውን ኣሕምልቲ ዝኾነ ጥዑይ መግቢ ንኣካላት ኣገዳሲ እዩ። እታ
      ባቡር ብሰዓታ ካብ መደበር ትብገስ ምሸት ከኣ ናብታ ከተማ ትበጽሕ። ኣብ ክረምቲ
      ስድራቤታት ንምዕራፍ ናብ ባሕሪ ወይ ናብ ጎቦታት ይኸዱ። መንግስቲ ብዛዕባ ሓለዋ
      ኣከባቢ ሓድሽ ሕጊ ኣጽዲቑ ኣሎ። ሙዚቃን ስነ ጥበብን ኣብ ህይወት ብዙሓት ሰባት
      ዓቢ ግደ ይጻወቱ። ትማሊ ብዛዕባ እቲ ጉዕዞ ንኣዕሩኽትና ነዊሕ ደብዳቤ ጸሓፍና።
      እታ መጽሓፍ ኣብ ጥቓ መስኮት ኣብ ዘላ ጣውላ ተቐሚጣ ንኣንባቢኣ ትጽበ ኣላ።""")

  /** The shared normalization: lowercase, collapse every non-letter run
    * to a single space. Letters = ASCII + Latin-1 + Latin Extended-A
    * (Polish/Czech/Turkish diacritics, U+0100-017F, contiguous with
    * Latin-1) + Vietnamese horn vowels (U+01A0-01B0) + Latin Extended
    * Additional (Vietnamese tone marks, U+1E00-1EFF) + the schwa ə
    * (U+0259, round 18: Azerbaijani's most frequent letter — Ə
    * U+018F lowercases into it; without it az text lost its one
    * reliable discriminator against Turkish). Round 19 widens to the
    * FULL contiguous U+00DF–02AF block (subsuming the former
    * Latin-1/Ext-A/horn-vowel/schwa islands and adding Latin
    * Extended-B + IPA: Hausa's hooked ɓ/ɗ/ƙ/ƴ live there — without
    * them ha text shredded at every hooked consonant) plus the
    * combining diacritics U+0300–036F (Yoruba tone marks compose onto
    * underdot vowels with no precomposed form — ọ̀ is U+1ECD+U+0300;
    * dropping the mark also stops shredding any NFD-decomposed Latin
    * text). Zero existing profiles move: the seeds use nothing in the
    * added ranges (scan-verified; Romanian comma-below ș/ț U+0219/021B
    * are now KEPT rather than collapsed, so either orthography scores
    * on its full trigram stream). The regex MUST stay
    * codepoint-identical across Java and DuckDB RE2 — see
    * [[oracleSql]]. */
  val NormRegexJava: String = "[^a-z\u00DF-\u02AF\u0300-\u036F\u1E00-\u1EFF]+"
  val NormRegexRe2: String =
    "[^a-z\\x{00DF}-\\x{02AF}\\x{0300}-\\x{036F}\\x{1E00}-\\x{1EFF}]+"

  /** Cyrillic normalization: lowercase, keep the lowercase Cyrillic
    * block U+0430–045F (а-я, ё, Ukrainian є/і/ї, Serbian ј/љ/њ/ћ/ђ/џ,
    * Belarusian ў, Macedonian ѓ/ѕ/ќ) PLUS the Cyrillic extended
    * letters U+0460–04FF (round 19, VERDICT r18 #3: Kazakh
    * ә/ғ/қ/ң/ө/ұ/ү/һ, Kyrgyz ө/ү/ң, Tajik ғ/ӣ/қ/ӯ/ҳ/ҷ, Mongolian
    * ө/ү live there — without them those languages' most
    * discriminative letters collapsed to spaces and their text
    * labeled as a wrong near-neighbor, ru/bg). The extended range
    * interleaves uppercase forms, but input is lowercased first, so
    * keeping them is a no-op — and the bg/ru/sr/uk seeds use only the
    * base block, so their profiles are bit-identical under the wider
    * range. Everything else collapses to single spaces. */
  val NormRegexCyrJava: String = "[^а-ӿ]+"
  val NormRegexCyrRe2: String = "[^\\x{0430}-\\x{04FF}]+"

  /** Arabic-script normalization (no case): core letters U+0621–064A
    * plus the extended block U+0679–06D3 carrying the Persian/Urdu/
    * Pashto letters (پ چ ژ گ ک ی ے ټ ډ ړ ښ ...) plus ە (U+06D5 alone —
    * round 19: Sorani Kurdish's most frequent letter; U+06D4, the
    * Urdu full stop between them, must stay PUNCTUATION or the ur
    * profile would span sentence boundaries); digits (U+0660s,
    * U+06F0s), harakat (U+064B+) and punctuation collapse to
    * spaces. */
  val NormRegexArabJava: String = "[^ء-يٹ-ۓە]+"
  val NormRegexArabRe2: String =
    "[^\\x{0621}-\\x{064A}\\x{0679}-\\x{06D3}\\x{06D5}]+"

  /** Devanagari normalization (no case): signs, letters and matras
    * U+0901–0963; digits (U+0966–096F) and the danda punctuation
    * (U+0964–0965) collapse to spaces. */
  val NormRegexDevaJava: String = "[^ँ-ॣ]+"
  val NormRegexDevaRe2: String = "[^\\x{0901}-\\x{0963}]+"

  /** Bengali-script normalization (no case): signs, letters, matras
    * and vowel signs U+0981–09E3 (covers the nukta forms ড়/ঢ়/য়,
    * khanda-ta ৎ, the au-length mark ৗ) PLUS the Assamese letters
    * ৰ/ৱ (U+09F0–09F1) — the discriminating pair; digits (U+09E6+)
    * collapse to spaces (the danda is in the Devanagari block). */
  val NormRegexBengJava: String = "[^ঁ-ৣৰৱ]+"
  val NormRegexBengRe2: String =
    "[^\\x{0981}-\\x{09E3}\\x{09F0}-\\x{09F1}]+"

  /** Ethiopic normalization (no case): the syllable letters
    * U+1200–135A (ሀ-ፚ, covering both Amharic and Tigrinya series);
    * Ge'ez punctuation (።/፣, U+1361+) and digits collapse to
    * spaces. */
  val NormRegexEthiJava: String = "[^ሀ-ፚ]+"
  val NormRegexEthiRe2: String = "[^\\x{1200}-\\x{135A}]+"

  /** The Java-regex spelling of each script's normalization. */
  def normRegexJavaFor(script: String): String = script match {
    case "latin" => NormRegexJava
    case "cyr"   => NormRegexCyrJava
    case "arab"  => NormRegexArabJava
    case "deva"  => NormRegexDevaJava
    case "beng"  => NormRegexBengJava
    case "ethi"  => NormRegexEthiJava
    case other   => throw new IllegalArgumentException(s"script $other")
  }

  /** The RE2 (DuckDB) spelling — codepoint-identical to the Java one. */
  def normRegexRe2For(script: String): String = script match {
    case "latin" => NormRegexRe2
    case "cyr"   => NormRegexCyrRe2
    case "arab"  => NormRegexArabRe2
    case "deva"  => NormRegexDevaRe2
    case "beng"  => NormRegexBengRe2
    case "ethi"  => NormRegexEthiRe2
    case other   => throw new IllegalArgumentException(s"script $other")
  }

  def normalizeJvm(text: String, script: String = "latin"): String =
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(normRegexJavaFor(script), " ")

  private def trigramsOf(norm: String): Iterator[String] = {
    val cps = norm.codePoints().toArray
    if (cps.length < 3) Iterator.empty
    else (0 to cps.length - 3).iterator.map(i => new String(cps, i, 3))
  }

  /** lang -> (trigram -> scaled log-prob weight), per script bucket —
    * each seed normalizes with ITS script's regex. Deterministic:
    * StrictMath.log, ties broken by trigram code order. */
  lazy val ProfilesByScript: Map[String, Map[String, Seq[(String, Long)]]] =
    ScriptLangs.map { case (script, langs) =>
      script -> langs.map { lang =>
        val counts = trigramsOf(normalizeJvm(Seeds(lang), script))
          .foldLeft(Map.empty[String, Long]) { (m, t) =>
            m.updated(t, m.getOrElse(t, 0L) + 1L)
          }
        val total = counts.values.sum.toDouble
        val top = counts.toSeq
          .sortBy { case (t, c) => (-c, t) }
          .take(ProfileK)
          .map { case (t, c) =>
            val w = math.round(100.0 * StrictMath.log(c.toDouble / total))
            // keep every real profile entry strictly above the penalty
            (t, math.max(w, Penalty + 1L))
          }
        lang -> top
      }.toMap
    }

  /** The Latin bucket's profiles — the original q86 surface. */
  lazy val Profiles: Map[String, Seq[(String, Long)]] =
    ProfilesByScript("latin")

  /** Combined lookup used by the scoring expression: trigram -> weight
    * per ScriptLangs(script) position, Penalty where the language's
    * profile lacks the trigram. */
  lazy val CombinedProfiles
      : Map[String, java.util.HashMap[String, Array[Long]]] =
    ScriptLangs.map { case (script, langs) =>
      val m = new java.util.HashMap[String, Array[Long]]()
      ProfilesByScript(script).foreach { case (lang, entries) =>
        val j = langs.indexOf(lang)
        entries.foreach { case (t, w) =>
          val arr = m.computeIfAbsent(t, _ => Array.fill(langs.size)(Penalty))
          arr(j) = w
        }
      }
      script -> m
    }

  /** Latin combined profile (back-compat name for the expression). */
  lazy val CombinedProfile: java.util.HashMap[String, Array[Long]] =
    CombinedProfiles("latin")

  // --- script detection (shared ranges; Java and RE2 spellings) ---
  private val ScriptRanges: Seq[(String, String, String)] = Seq(
    // (name, java char class, re2 char class) — same codepoint ranges.
    // greek/hebr/beng (round 17, VERDICT r16 #3) are SINGLE-LANGUAGE
    // buckets: the script ratio alone decides el/he/bn — before this,
    // Greek and Hebrew text normalized to nothing in every trigram
    // bucket and exited via the Latin zero-trigram prior as 'en', a
    // WRONG label (the same class r16 fixed for Cyrillic/Arabic/
    // Devanagari). Greek spans the base block + Greek Extended
    // (polytonic); Bengali script also carries Assamese — as/or would
    // widen beng into a Devanagari-style trigram bucket later.
    ("kana", "[\\u3040-\\u30FF]", "[\\x{3040}-\\x{30FF}]"),
    ("han", "[\\u4E00-\\u9FFF]", "[\\x{4E00}-\\x{9FFF}]"),
    ("hangul", "[\\uAC00-\\uD7A3]", "[\\x{AC00}-\\x{D7A3}]"),
    ("cyr", "[\\u0400-\\u04FF]", "[\\x{0400}-\\x{04FF}]"),
    ("arab", "[\\u0600-\\u06FF]", "[\\x{0600}-\\x{06FF}]"),
    ("deva", "[\\u0900-\\u097F]", "[\\x{0900}-\\x{097F}]"),
    ("greek", "[\\u0370-\\u03FF\\u1F00-\\u1FFF]",
      "[\\x{0370}-\\x{03FF}\\x{1F00}-\\x{1FFF}]"),
    ("hebr", "[\\u0590-\\u05FF]", "[\\x{0590}-\\x{05FF}]"),
    ("beng", "[\\u0980-\\u09FF]", "[\\x{0980}-\\x{09FF}]"),
    ("thai", "[\\u0E00-\\u0E7F]", "[\\x{0E00}-\\x{0E7F}]"),
    // round-17 single-language blocks (see SingleLangScripts)
    ("taml", "[\\u0B80-\\u0BFF]", "[\\x{0B80}-\\x{0BFF}]"),
    ("telu", "[\\u0C00-\\u0C7F]", "[\\x{0C00}-\\x{0C7F}]"),
    ("knda", "[\\u0C80-\\u0CFF]", "[\\x{0C80}-\\x{0CFF}]"),
    ("mlym", "[\\u0D00-\\u0D7F]", "[\\x{0D00}-\\x{0D7F}]"),
    ("gujr", "[\\u0A80-\\u0AFF]", "[\\x{0A80}-\\x{0AFF}]"),
    ("guru", "[\\u0A00-\\u0A7F]", "[\\x{0A00}-\\x{0A7F}]"),
    ("orya", "[\\u0B00-\\u0B7F]", "[\\x{0B00}-\\x{0B7F}]"),
    ("sinh", "[\\u0D80-\\u0DFF]", "[\\x{0D80}-\\x{0DFF}]"),
    ("geor", "[\\u10A0-\\u10FF]", "[\\x{10A0}-\\x{10FF}]"),
    ("armn", "[\\u0530-\\u058F]", "[\\x{0530}-\\x{058F}]"),
    ("ethi", "[\\u1200-\\u137F]", "[\\x{1200}-\\x{137F}]"),
    ("laoo", "[\\u0E80-\\u0EFF]", "[\\x{0E80}-\\x{0EFF}]"),
    ("khmr", "[\\u1780-\\u17FF]", "[\\x{1780}-\\x{17FF}]"),
    ("mymr", "[\\u1000-\\u109F]", "[\\x{1000}-\\x{109F}]"))

  /** Language ID over a DataFrame. Output: id, n_tri, n_tri_cyr,
    * n_tri_arab, score_<lang> per ScriptLangs bucket, pred_lang.
    * Map-only (no shuffle): all three normalizations, the script
    * ratios and the three trigram scans fuse into the scan; each
    * profile table rides along as task-local state. Script ratios
    * route to the script's OWN trigram argmax (round 16) — 'ru'/'ar'
    * remain only the zero-trigram priors of their buckets. */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tx = coalesce(col(textCol), lit(""))
    val low = lower(tx)
    val base = df.select(
      col(idCol).as("id"),
      tx.as("__tx"),
      regexp_replace(low, NormRegexJava, " ").as("__nrm"),
      regexp_replace(low, NormRegexCyrJava, " ").as("__nrmc"),
      regexp_replace(low, NormRegexArabJava, " ").as("__nrma"),
      regexp_replace(low, NormRegexDevaJava, " ").as("__nrmd"),
      regexp_replace(low, NormRegexBengJava, " ").as("__nrmb"),
      regexp_replace(low, NormRegexEthiJava, " ").as("__nrme"),
      greatest(length(tx), lit(1)).cast("long").as("__len"))
    val withCounts = ScriptRanges.foldLeft(base) { case (d, (name, javaRe, _)) =>
      d.withColumn(s"__$name", regexp_count(col("__tx"), lit(javaRe)).cast("long"))
    }
    def scoresOf(c: String, script: String) = GraftBridge.column(
      graft.plans.LangTrigramScores(GraftBridge.expression(col(c)), script))
    val scored = withCounts
      .withColumn("n_tri", greatest(length(col("__nrm")) - 2, lit(0)).cast("long"))
      .withColumn("n_tri_cyr",
        greatest(length(col("__nrmc")) - 2, lit(0)).cast("long"))
      .withColumn("n_tri_arab",
        greatest(length(col("__nrma")) - 2, lit(0)).cast("long"))
      .withColumn("n_tri_deva",
        greatest(length(col("__nrmd")) - 2, lit(0)).cast("long"))
      .withColumn("n_tri_beng",
        greatest(length(col("__nrmb")) - 2, lit(0)).cast("long"))
      .withColumn("n_tri_ethi",
        greatest(length(col("__nrme")) - 2, lit(0)).cast("long"))
      .withColumn("__scores", scoresOf("__nrm", "latin"))
      .withColumn("__scoresC", scoresOf("__nrmc", "cyr"))
      .withColumn("__scoresA", scoresOf("__nrma", "arab"))
      .withColumn("__scoresD", scoresOf("__nrmd", "deva"))
      .withColumn("__scoresB", scoresOf("__nrmb", "beng"))
      .withColumn("__scoresE", scoresOf("__nrme", "ethi"))
    val withScoreCols = Seq(
      ("__scores", TrigramLangs), ("__scoresC", CyrillicLangs),
      ("__scoresA", ArabicLangs), ("__scoresD", DevanagariLangs),
      ("__scoresB", BengaliLangs), ("__scoresE", EthiopicLangs))
      .foldLeft(scored) {
      case (d0, (arr, langs)) => langs.zipWithIndex.foldLeft(d0) {
        case (d, (lang, i)) =>
          d.withColumn(s"score_$lang", element_at(col(arr), i + 1))
      }
    }
    def pickIn(langs: Seq[String]): Column = {
      val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
      langs.foldRight(lit("und")) { (l, acc) =>
        when(col(s"score_$l") === best, lit(l)).otherwise(acc)
      }
    }
    val cyrPick =
      when(col("n_tri_cyr") === 0, lit("ru")).otherwise(pickIn(CyrillicLangs))
    val arabPick =
      when(col("n_tri_arab") === 0, lit("ar")).otherwise(pickIn(ArabicLangs))
    val devaPick =
      when(col("n_tri_deva") === 0, lit("hi"))
        .otherwise(pickIn(DevanagariLangs))
    val bengPick =
      when(col("n_tri_beng") === 0, lit("bn"))
        .otherwise(pickIn(BengaliLangs))
    val ethiPick =
      when(col("n_tri_ethi") === 0, lit("am"))
        .otherwise(pickIn(EthiopicLangs))
    val pred =
      SingleLangScripts.foldLeft(
        when(col("__kana") * 20 >= col("__len"), lit("ja"))
          .when(col("__han") * 20 >= col("__len") * 3, lit("zh"))
          .when(col("__hangul") * 20 >= col("__len") * 3, lit("ko"))
          .when(col("__cyr") * 10 >= col("__len") * 3, cyrPick)
          .when(col("__arab") * 20 >= col("__len") * 3, arabPick)
          .when(col("__deva") * 20 >= col("__len") * 3, devaPick)
          .when(col("__beng") * 20 >= col("__len") * 3, bengPick)
          .when(col("__ethi") * 20 >= col("__len") * 3, ethiPick)) {
        case (w, (script, lang)) =>
          w.when(col(s"__$script") * 20 >= col("__len") * 3, lit(lang))
      }
        .when(col("n_tri") === 0, lit("und"))
        .otherwise(pickIn(TrigramLangs))
    val scoreCols =
      (TrigramLangs ++ CyrillicLangs ++ ArabicLangs ++ DevanagariLangs ++
        BengaliLangs ++ EthiopicLangs).map(l => s"score_$l")
    withScoreCols
      .withColumn("pred_lang", pred)
      .select(("id" +: "n_tri" +: "n_tri_cyr" +: "n_tri_arab" +:
        "n_tri_deva" +: "n_tri_beng" +: "n_tri_ethi" +: scoreCols
        :+ "pred_lang")
        .map(col): _*)
  }

  /** DuckDB oracle replaying the SAME profiles (as VALUES literal
    * tables, one per script bucket), normalizations, integer scoring
    * and decision chain. `prelude` prepends extra CTEs (e.g. a literal
    * `docs(...) AS (VALUES ...)` corpus for the script-bucket query). */
  def oracleSql(table: String, idCol: String, textCol: String,
                prelude: String = ""): String = {
    // (script, CTE suffix, n_tri column) — latin keeps the unsuffixed
    // names so the q86 surface is unchanged in shape
    val buckets = Seq(("latin", "", "n_tri"), ("cyr", "_c", "n_tri_cyr"),
      ("arab", "_a", "n_tri_arab"), ("deva", "_d", "n_tri_deva"),
      ("beng", "_b", "n_tri_beng"), ("ethi", "_e", "n_tri_ethi"))
    def profRows(script: String) = ScriptLangs(script).flatMap { lang =>
      ProfilesByScript(script)(lang).map { case (t, w) =>
        val esc = t.replace("'", "''")
        s"('$lang', '$esc', ${w}::BIGINT)"
      }
    }.mkString(",\n        ")
    val scriptCols = ScriptRanges.map { case (name, _, re2) =>
      s"len(regexp_extract_all(tx, '$re2')) AS c_$name"
    }.mkString(",\n          ")
    def pivot(script: String) = ScriptLangs(script).map { l =>
      s"""coalesce(sum(CASE WHEN lang = '$l' THEN mw END), 0) AS mw_$l,
          coalesce(sum(CASE WHEN lang = '$l' THEN mc END), 0) AS mc_$l"""
    }.mkString(",\n          ")
    def scoreCols(script: String, nTriCol: String) =
      ScriptLangs(script).map { l =>
        s"CAST(coalesce(mw_$l, 0) + (s.$nTriCol - coalesce(mc_$l, 0)) * (${Penalty}) AS BIGINT) AS score_$l"
      }.mkString(",\n          ")
    def caseArms(script: String) = {
      val langs = ScriptLangs(script)
      val bestExpr =
        s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      langs.map(l => s"WHEN score_$l = $bestExpr THEN '$l'")
        .mkString("\n             ")
    }
    val scoreBlocks = buckets.map { case (script, sx, nTriCol) => s"""
      tg$sx AS (
        SELECT id, unnest(list_transform(generate_series(1, length(nrm$sx) - 2),
            i -> substring(nrm$sx, i, 3))) AS t
        FROM base WHERE length(nrm$sx) >= 3),
      prof$sx(lang, t, w) AS (VALUES
        ${profRows(script)}),
      m$sx AS (
        SELECT tg$sx.id, prof$sx.lang, sum(prof$sx.w) AS mw, count(*) AS mc
        FROM tg$sx JOIN prof$sx ON tg$sx.t = prof$sx.t GROUP BY 1, 2),
      mp$sx AS (
        SELECT id,
          ${pivot(script)}
        FROM m$sx GROUP BY id)"""
    }.mkString(",")
    val allScoreCols = buckets.map { case (script, _, nTriCol) =>
      scoreCols(script, nTriCol) }.mkString(",\n          ")
    val allScoreNames = buckets.flatMap { case (script, _, _) =>
      ScriptLangs(script).map(l => s"score_$l") }.mkString(", ")
    s"""
      WITH ${prelude}base AS (
        SELECT $idCol AS id,
          coalesce($textCol, '') AS tx,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexRe2', ' ', 'g') AS nrm,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexCyrRe2', ' ', 'g') AS nrm_c,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexArabRe2', ' ', 'g') AS nrm_a,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexDevaRe2', ' ', 'g') AS nrm_d,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexBengRe2', ' ', 'g') AS nrm_b,
          regexp_replace(lower(coalesce($textCol, '')), '$NormRegexEthiRe2', ' ', 'g') AS nrm_e
        FROM $table),
      feat AS (
        SELECT id, tx,
          greatest(length(tx), 1) AS l,
          $scriptCols,
          greatest(length(nrm) - 2, 0) AS n_tri,
          greatest(length(nrm_c) - 2, 0) AS n_tri_cyr,
          greatest(length(nrm_a) - 2, 0) AS n_tri_arab,
          greatest(length(nrm_d) - 2, 0) AS n_tri_deva,
          greatest(length(nrm_b) - 2, 0) AS n_tri_beng,
          greatest(length(nrm_e) - 2, 0) AS n_tri_ethi
        FROM base),$scoreBlocks,
      fin AS (
        SELECT s.id, CAST(s.n_tri AS BIGINT) AS n_tri,
          CAST(s.n_tri_cyr AS BIGINT) AS n_tri_cyr,
          CAST(s.n_tri_arab AS BIGINT) AS n_tri_arab,
          CAST(s.n_tri_deva AS BIGINT) AS n_tri_deva,
          CAST(s.n_tri_beng AS BIGINT) AS n_tri_beng,
          CAST(s.n_tri_ethi AS BIGINT) AS n_tri_ethi,
          s.l, ${ScriptRanges.map { case (n, _, _) => s"s.c_$n" }.mkString(", ")},
          $allScoreCols
        FROM feat s LEFT JOIN mp ON mp.id = s.id
          LEFT JOIN mp_c ON mp_c.id = s.id
          LEFT JOIN mp_a ON mp_a.id = s.id
          LEFT JOIN mp_d ON mp_d.id = s.id
          LEFT JOIN mp_b ON mp_b.id = s.id
          LEFT JOIN mp_e ON mp_e.id = s.id)
      SELECT id AS $idCol, n_tri, n_tri_cyr, n_tri_arab, n_tri_deva, n_tri_beng, n_tri_ethi, $allScoreNames,
        CASE WHEN c_kana * 20 >= l THEN 'ja'
             WHEN c_han * 20 >= l * 3 THEN 'zh'
             WHEN c_hangul * 20 >= l * 3 THEN 'ko'
             WHEN c_cyr * 10 >= l * 3 THEN
               CASE WHEN n_tri_cyr = 0 THEN 'ru'
             ${caseArms("cyr")}
             ELSE 'und' END
             WHEN c_arab * 20 >= l * 3 THEN
               CASE WHEN n_tri_arab = 0 THEN 'ar'
             ${caseArms("arab")}
             ELSE 'und' END
             WHEN c_deva * 20 >= l * 3 THEN
               CASE WHEN n_tri_deva = 0 THEN 'hi'
             ${caseArms("deva")}
             ELSE 'und' END
             WHEN c_beng * 20 >= l * 3 THEN
               CASE WHEN n_tri_beng = 0 THEN 'bn'
             ${caseArms("beng")}
             ELSE 'und' END
             WHEN c_ethi * 20 >= l * 3 THEN
               CASE WHEN n_tri_ethi = 0 THEN 'am'
             ${caseArms("ethi")}
             ELSE 'und' END
             ${SingleLangScripts.map { case (script, lang) =>
               s"WHEN c_$script * 20 >= l * 3 THEN '$lang'" }
               .mkString("\n             ")}
             WHEN n_tri = 0 THEN 'und'
             ${caseArms("latin")}
             ELSE 'und' END AS pred_lang
      FROM fin ORDER BY id"""
  }
}
